"""Pallas paged decode attention: stream pages by block table, no gather.

The XLA realization (`ops.core.paged_attention`) gathers every row's full
page list into a dense [B, KVH, maxp*page, HD] tensor each step — correct,
but it materializes O(B * max_seq_len) rows per layer per step regardless of
actual sequence lengths (VERDICT r1 missing #3).  At 8B serving shapes that
intermediate is the capacity ceiling: B=32 x M=8192 x KVH=8 x HD=128 bf16 is
1 GB per layer per step of scratch the pools themselves never need.

This kernel walks each row's block table directly:

  * grid (B,) — one program per request row;
  * the page pools stay in HBM (`memory_space=HBM`); the kernel issues its
    own async DMAs following the row's block table (scalar-prefetched, so
    indices are ready before the body runs).  One DMA fetches a whole page
    across all KV heads ([KVH, page, HD] — contiguous in the pool layout);
  * pages are processed in chunks of C: the C DMAs of the next chunk are all
    in flight while the current chunk computes (2-deep chunk pipeline, 2*C
    outstanding copies), and each compute step is one fat flash update over
    C*page columns for every head — few, large iterations instead of many
    tiny ones;
  * the chunk loop is a `fori_loop` bounded by the row's TRUE page count
    ceil((pos+1)/page) — HBM traffic tracks the tokens that exist, not
    max_seq_len, and idle/short rows cost almost nothing;
  * flash-style online softmax (running max / normalizer / accumulator, all
    in VMEM scratch) masked to kv_idx <= pos[b], so tail slots inside the
    last page (and the reserved null page 0 behind unused table entries) are
    never attended.

Pool layout is [P, KVH, page, HD] (kvcache.init_paged_cache) so one page is
a single contiguous [KVH, page, HD] DMA.  `supports()` gates the compiled
path: Mosaic requires a manual DMA's last dim to be 128-aligned, so
HD % 128 == 0 (8B-class models) — smaller heads keep the XLA gather.

`ops.core.paged_attention` is the numerics oracle (tests/test_pallas.py);
the serving engine picks this kernel via StaticConfig.paged_kernel.
Pattern reference: ragged paged attention (PAPERS.md) — reimplemented here
TPU-first on the framework's own pool layout.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8  # pages fetched/processed per pipeline step


def supports(head_dim: int, page_size: int, kv_dtype) -> bool:
    """Shapes the compiled kernel can DMA: Mosaic requires a manual HBM->VMEM
    copy's last dimension to be 128-aligned (measured on v5e: HD=48 is
    rejected with "Slice shape along dimension 3 must be aligned to tiling"),
    and the page must fill the dtype's sublane tile (8 rows at 4-byte, 16 at
    2-byte, 32 at 1-byte — int8 pools need page_size >= 32).  8B-class
    models (HD=128) qualify; stories15M-class (HD=48) falls back to the XLA
    gather, which is fine at that scale."""
    min_sublane = {1: 32, 2: 16}.get(jnp.dtype(kv_dtype).itemsize, 8)
    return head_dim % 128 == 0 and page_size % min_sublane == 0


def _kernel(*refs,                      # prefetch (SMEM), blocks, scratch
            page: int, kvh: int, scale: float, chunk: int,
            quant: bool = False, stacked: bool = False,
            window: bool = False):
    # Prefetch order: bt, pos, [layer (stacked)], [win_count (window)],
    # [cur-k/v scales (quant append)].  Stacked mode == appended-current
    # mode: the pools are the whole-model [NL, P, KVH, page, HD] stacks
    # holding tokens 0..pos-1 (strict mask) and the current token's K/V ride
    # as explicit [KVH, HD] blocks, folded in after the page loop — the
    # serving layer scan keeps the pool loop-invariant and commits rows once
    # per step outside.  Window mode (deferred-commit quantum scans,
    # models/llama.py ragged_decode_steps): the pool holds tokens < pos for
    # the WHOLE quantum, the quantum's own in-flight rows ride a
    # [KVH, Q, HD] VMEM block, and only columns < win_count are visible.
    it = iter(refs)
    bt_ref, pos_ref = next(it), next(it)
    li_ref = next(it) if stacked else None
    wc_ref = next(it) if window else None
    kscur_ref = vscur_ref = None
    if quant and stacked:
        kscur_ref, vscur_ref = next(it), next(it)
    q_ref, kp_ref, vp_ref = next(it), next(it), next(it)
    if quant:
        # int8 pools: per-(token, head) scale rows [KVH, maxp*page] ride a
        # regular VMEM block (gathered outside by ops.gather_page_scales —
        # 1/HD of the value traffic); the value pages still stream by DMA.
        ks_ref, vs_ref = next(it), next(it)
    else:
        ks_ref = vs_ref = None
    if stacked:
        ck_ref, cv_ref = next(it), next(it)
    wk_ref = wv_ref = wks_ref = wvs_ref = None
    if window:
        wk_ref, wv_ref = next(it), next(it)
        if quant:
            wks_ref, wvs_ref = next(it), next(it)
    o_ref = next(it)
    kbuf, vbuf, m_s, l_s, acc_s, sem_k, sem_v = it
    b = pl.program_id(0)
    pos = pos_ref[b]
    # Pages that hold real tokens — clamped to the block-table width: a row
    # that retires mid-quantum keeps advancing `pos` inside the jitted scan
    # (models/llama.py ragged_decode_steps), so pos can reach max_seq_len;
    # unclamped, bt_ref[b, j] for j >= maxp reads out of bounds of the SMEM
    # table and DMAs a garbage page index.  Overrun rows' outputs are
    # discarded by the caller; in-range rows are unaffected by the clamp.
    # Stacked/append mode: the pool holds pos tokens (0..pos-1), not pos+1.
    held = pos if stacked else pos + 1
    n = jnp.minimum((held + page - 1) // page, bt_ref.shape[1])
    nc = (n + chunk - 1) // chunk           # chunks (0 iff append with pos=0)
    vlim = pos - 1 if stacked else pos      # visible: kv_idx <= vlim

    def page_dma(buf, pool_ref, sem, slot, c, j):
        # Page j of row b -> chunk-buffer slot (slot, c).  One DMA covers all
        # KV heads of the page ([KVH, page, HD], contiguous in the pool).
        src = (pool_ref.at[li_ref[0], bt_ref[b, j]] if stacked
               else pool_ref.at[bt_ref[b, j]])
        return pltpu.make_async_copy(src, buf.at[slot, c], sem.at[slot, c])

    def start_chunk(slot, cidx):
        for c in range(chunk):  # static unroll; C copies go out back-to-back
            @pl.when(cidx * chunk + c < n)
            def _():
                page_dma(kbuf, kp_ref, sem_k, slot, c, cidx * chunk + c).start()
                page_dma(vbuf, vp_ref, sem_v, slot, c, cidx * chunk + c).start()

    start_chunk(0, 0)

    q = q_ref[:].astype(jnp.float32)        # [KVH, G, HD]
    g, hd = q.shape[1], q.shape[2]
    m_s[:] = jnp.full_like(m_s, -jnp.inf)
    l_s[:] = jnp.zeros_like(l_s)
    acc_s[:] = jnp.zeros_like(acc_s)
    cols = chunk * page

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nc)
        def _():
            start_chunk(jax.lax.rem(ci + 1, 2), ci + 1)

        for c in range(chunk):
            @pl.when(ci * chunk + c < n)
            def _():
                page_dma(kbuf, kp_ref, sem_k, slot, c, ci * chunk + c).wait()
                page_dma(vbuf, vp_ref, sem_v, slot, c, ci * chunk + c).wait()

        # One flash update over the whole chunk (cols = chunk*page columns),
        # all heads.  kv_idx >= (pos+1) columns — the tail of the last real
        # page, whole over-fetched pages, and anything behind unused table
        # entries — are masked off.
        kv_idx = ci * cols + jax.lax.broadcasted_iota(
            jnp.int32, (1, cols), 1)                       # [1, cols]
        visible = kv_idx <= vlim
        # Column form of the mask for V: slots past `n` were never DMA'd and
        # hold garbage (NaN in interpret mode); 0 * NaN = NaN, so the zeroed
        # softmax columns alone don't protect the p @ v contraction.
        vis_col = (ci * cols + jax.lax.broadcasted_iota(
            jnp.int32, (cols, 1), 0)) <= vlim
        for h in range(kvh):                                # static unroll
            ks = kbuf[slot, :, h].reshape(cols, hd).astype(jnp.float32)
            vs = jnp.where(vis_col,
                           vbuf[slot, :, h].reshape(cols, hd), 0
                           ).astype(jnp.float32)
            s = jax.lax.dot_general(
                q[h], ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                       # [G, cols]
            if quant:
                # Commuting int8 dequantization: K scales post-multiply the
                # score columns; V scales fold into the probs below.
                ksc = ks_ref[pl.ds(h, 1), pl.ds(ci * cols, cols)]
                s = s * ksc
            s = jnp.where(visible, s, -jnp.inf)
            m = m_s[h]                                      # [G, 1]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            # Chunk 0 always has a visible column (pos >= 0) so m_new is
            # finite from the first iteration for every row that runs.
            p = jnp.where(visible, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_s[h] = l_s[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = p
            if quant:
                vsc = vs_ref[pl.ds(h, 1), pl.ds(ci * cols, cols)]
                pv = p * vsc
            acc_s[h] = acc_s[h] * alpha + jnp.dot(
                pv, vs, preferred_element_type=jnp.float32)
            m_s[h] = m_new
        return 0

    jax.lax.fori_loop(0, nc, body, 0)
    if window:
        # Fold the quantum's in-flight rows: window column s holds the
        # token decoded at quantum step s (position pos + s); only columns
        # s < win_count exist yet.  Unwritten columns carry garbage — the
        # -inf mask zeroes their probs and the V-side column mask protects
        # the p @ v contraction (0 * garbage).
        nq = wk_ref.shape[1]
        wcount = wc_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1)
        wvis_col = jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0) < wcount
        for h in range(kvh):
            wk = wk_ref[h].astype(jnp.float32)              # [Q, HD]
            wvr = jnp.where(wvis_col, wv_ref[h], 0).astype(jnp.float32)
            s = jax.lax.dot_general(
                q[h], wk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                       # [G, Q]
            if quant:
                s = s * wks_ref[pl.ds(h, 1), :]
            s = jnp.where(col < wcount, s, -jnp.inf)
            m = m_s[h]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(col < wcount, jnp.exp(s - m_new), 0.0)
            # m_new can still be -inf here (pos == 0 ran zero page chunks
            # AND wcount == 0 masked every window column); exp(m - m_new)
            # would be exp(-inf - -inf) = nan, poisoning l/acc (0 * nan).
            # Nothing has accumulated in that case, so alpha := 1.
            alpha = jnp.where(m_new == -jnp.inf, 1.0, jnp.exp(m - m_new))
            l_s[h] = l_s[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = p
            if quant:
                pv = p * wvs_ref[pl.ds(h, 1), :]
            acc_s[h] = acc_s[h] * alpha + jnp.dot(
                pv, wvr, preferred_element_type=jnp.float32)
            m_s[h] = m_new
    if stacked:
        # Fold in the current token's appended column (always visible; the
        # only column when pos == 0 and the page loop ran zero chunks).
        # Quantized rows post-scale exactly like a read-back of the written
        # pool slot: score * k_scale, prob * v_scale.
        for h in range(kvh):
            ckr = ck_ref[h].astype(jnp.float32)             # [HD]
            s_cur = jnp.sum(q[h] * ckr[None, :], axis=-1,
                            keepdims=True) * scale          # [G, 1]
            if quant:
                s_cur = s_cur * kscur_ref[b, h]
            m = m_s[h]
            m_new = jnp.maximum(m, s_cur)
            p = jnp.exp(s_cur - m_new)
            alpha = jnp.exp(m - m_new)
            l_s[h] = l_s[h] * alpha + p
            if quant:
                p = p * vscur_ref[b, h]
            acc_s[h] = acc_s[h] * alpha + p * cv_ref[h].astype(
                jnp.float32)[None, :]
            m_s[h] = m_new
    o_ref[:] = (acc_s[:] / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)


def paged_attention(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                    block_table: jax.Array, pos: jax.Array,
                    k_scale_rows=None, v_scale_rows=None,
                    layer=None, cur_k=None, cur_v=None,
                    cur_ks=None, cur_vs=None,
                    win_k=None, win_v=None, win_ks=None, win_vs=None,
                    win_count=None,
                    interpret: bool = False) -> jax.Array:
    """Decode attention over the paged cache by streaming block-table pages.

    q: [B, 1, NH, HD]; pools [P, KVH, page, HD]; block_table [B, maxp] int32
    (unused entries -> null page 0); pos [B] int32 — row b attends
    kv_idx <= pos[b].  Returns [B, 1, NH, HD] (same contract as the XLA
    `ops.core.paged_attention`).

    int8 pools pass k_scale_rows/v_scale_rows [B, KVH, maxp*page] — the
    per-row dense scale gather (ops.core.gather_page_scales); scale traffic
    is 1/HD of the values so it rides an ordinary VMEM block while the
    values keep their streaming DMAs.

    Stacked mode (`layer` given): pools are the whole-model stacks
    [NL, P, KVH, page, HD] holding tokens 0..pos[b]-1 and the kernel DMAs
    pages of layer `layer`; the current token's K/V come in as cur_k/cur_v
    [B, KVH, HD] (pool dtype; int8 adds cur_ks/cur_vs [B, KVH] f32 scales)
    and are folded in after the page loop.  This keeps the pool a
    loop-invariant input of the serving layer scan (no pool-sized slice or
    re-stack per layer); the caller commits all layers' rows with one
    post-scan scatter (ops.core.commit_decode_rows_paged).

    Window mode (win_k/win_v [B, KVH, Q, HD] pool dtype, win_count a traced
    scalar; int8 adds win_ks/win_vs [B, KVH, Q] f32): the deferred-commit
    quantum-scan form — `pos` is the DISPATCH-START position (the pool holds
    tokens < pos[b] for the whole quantum), window column s holds the K/V of
    quantum step s, and only columns s < win_count are visible.  The caller
    commits the whole window once per quantum
    (ops.core.commit_window_paged).  Requires stacked mode.
    """
    B, L, NH, HD = q.shape
    assert L == 1, "paged attention is a decode (single-token) op"
    stacked = layer is not None
    window = win_k is not None
    assert not window or stacked, "window mode requires stacked mode"
    if stacked:
        assert cur_k is not None and cur_v is not None
        KVH, page = k_pages.shape[2], k_pages.shape[3]
    else:
        KVH, page = k_pages.shape[1], k_pages.shape[2]
    maxp = block_table.shape[1]
    G = NH // KVH
    chunk = min(CHUNK, maxp)
    qg = q.reshape(B, KVH, G, HD)
    quant = k_scale_rows is not None

    prefetch = [block_table.astype(jnp.int32), pos.astype(jnp.int32)]
    if stacked:
        prefetch.append(jnp.asarray(layer, jnp.int32).reshape(1))
        if window:
            prefetch.append(jnp.asarray(win_count, jnp.int32).reshape(1))
        if quant:
            prefetch += [cur_ks.astype(jnp.float32),
                         cur_vs.astype(jnp.float32)]

    scale_specs, scale_args = [], ()
    if quant:
        scale_specs = [
            pl.BlockSpec((None, KVH, maxp * page), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((None, KVH, maxp * page), lambda b, *_: (b, 0, 0)),
        ]
        scale_args = (k_scale_rows, v_scale_rows)
    cur_specs, cur_args = [], ()
    if stacked:
        cur_specs = [
            pl.BlockSpec((None, KVH, HD), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((None, KVH, HD), lambda b, *_: (b, 0, 0)),
        ]
        cur_args = (cur_k, cur_v)
    win_specs, win_args = [], ()
    if window:
        nq = win_k.shape[2]
        win_specs = [
            pl.BlockSpec((None, KVH, nq, HD), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((None, KVH, nq, HD), lambda b, *_: (b, 0, 0, 0)),
        ]
        win_args = (win_k, win_v)
        if quant:
            win_specs += [
                pl.BlockSpec((None, KVH, nq), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((None, KVH, nq), lambda b, *_: (b, 0, 0)),
            ]
            win_args += (win_ks.astype(jnp.float32),
                         win_vs.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, KVH, G, HD), lambda b, *_: (b, 0, 0, 0)),
            # Pools pinned to HBM: under ANY Mosaic may pull them into VMEM
            # (lane-padding HD, then rejecting the [page, HD] memref slice).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            *scale_specs,
            *cur_specs,
            *win_specs,
        ],
        out_specs=pl.BlockSpec((None, KVH, G, HD),
                               lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, KVH, page, HD), k_pages.dtype),
            pltpu.VMEM((2, chunk, KVH, page, HD), v_pages.dtype),
            pltpu.VMEM((KVH, G, 1), jnp.float32),    # running max
            pltpu.VMEM((KVH, G, 1), jnp.float32),    # normalizer
            pltpu.VMEM((KVH, G, HD), jnp.float32),   # accumulator
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA((2, chunk)),
        ],
    )

    out = pl.pallas_call(
        partial(_kernel, page=page, kvh=KVH, scale=1.0 / math.sqrt(HD),
                chunk=chunk, quant=quant, stacked=stacked, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*prefetch, qg, k_pages, v_pages, *scale_args, *cur_args, *win_args)
    return out.reshape(B, 1, NH, HD)
