"""Fused Pallas decode step: all transformer layers of one token step in a
single TPU kernel.

This is the framework's north-star kernel (BASELINE.json): the reference's
per-token Python loop dispatches ~58 NumPy ops (SURVEY §3.2); the XLA scan
path compiles them into dozens of small fused kernels per step whose fixed
costs dominate at stories15M scale.  Here one `pallas_call` walks the layers
as sequential grid steps:

  * per grid step `l`, BlockSpecs stream layer `l`'s weights HBM->VMEM
    (Mosaic double-buffers them against the previous layer's compute);
  * the KV caches are READ-ONLY inputs; the current token's K/V never
    enters them inside the kernel.  Attention masks the cache to
    `kv_idx < pos` and appends the new token's score/value explicitly in
    the softmax (same math, and row `pos` — which may hold a padded prefill
    tail or a recycled serving slot — is never attended).  The kernel emits
    the new rows as a tiny [NL, KVH, HD] output and the caller scatters
    them with one in-place XLA dynamic-update-slice.  This halves cache
    HBM traffic (no full-block write-back) and sidesteps Mosaic's 16-bit
    dynamic-store limits entirely, so bf16 caches run the fused kernel at
    full speed;
  * the hidden state lives in the output block (same block every step), so
    it stays resident in VMEM across layers;
  * RMSNorm, fused QKV matmul, split-halves RoPE, masked cache attention,
    o-projection, and SwiGLU all execute back-to-back with no kernel
    boundaries.

Four grid layouts share one math body (`_make_rope_row` / `_attend_head` /
`_swiglu_block`), chosen by the VMEM planners (`plan_layout`,
`plan_streamed`):

  * whole-layer: grid (layers,) — all of a layer's weights resident
    (stories15M class);
  * FFN-blocked: grid (layers, ffn_blocks) — attention weights resident,
    FFN streamed in column blocks (stories110M class);
  * KV-head-grouped: grid (layers, kv_heads + ffn_blocks) — attention also
    streamed per KV-head group; nothing layer-sized resident
    (TinyLlama class at short contexts);
  * streamed: grid (layers, KVH*(NDQ+NM+NDO) + ffn_blocks) — QKV D-blocked,
    cache attention M-blocked (flash), o-projection column-blocked; nothing
    bigger than a weight sub-block resident (llama3-8b class;
    `make_streamed_kernel`).

Scope (deliberate): batch=1, single-token decode, fused + rope-split param
layout (checkpoint.fuse_param_tree / permute_rope_layout).

The XLA-path ops in `ops.core` are the numerics oracle; parity is pinned by
tests/test_pallas.py in interpreter mode and by the bench parity gate on TPU.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


VMEM_BUDGET = 15.5 * 1024 * 1024  # against Mosaic's 16 MB scoped-vmem limit


def plan_ffn_block(args) -> int:
    """Choose the fused-decode kernel's FFN layout for `args`.

    Returns 0 (whole layer fits VMEM — single-grid kernel), a block size
    (FFN streamed in column blocks), or -1 (even the attention-side weights
    exceed VMEM — the XLA scan path applies).

    Demand models are calibrated against Mosaic's reported scoped
    allocations on v5e: whole-layer kernel `attn + 2*ffn + 3*cache + slack`
    (stories15M/M1024 fits); blocked kernel `attn + 2*blk + 4*cache + slack`
    (stories110M-bf16 sweep: blk512/M256 fits at ~16.0M; blk1024/M256 18.01M
    fails; blk2048/M256 27.01M fails; blk512/M512 25.51M fails — revisited
    attention blocks single-buffered, streamed FFN blocks double-buffered,
    cache blocks buffered more heavily under the 2-D grid).
    """
    import jax.numpy as jnp

    wsize = jnp.dtype(args.dtype).itemsize
    qd = args.n_heads * args.head_dim
    kvd = args.kv_heads * args.head_dim
    d, fd = args.dim, args.hidden_dim
    cache = 2 * args.kv_heads * args.max_seq_len * args.head_dim * \
        jnp.dtype(args.kv_dtype).itemsize
    attn = (d * (qd + 2 * kvd) + qd * d) * wsize
    ffn = (d * 2 * fd + fd * d) * wsize
    slack = 512 * 1024
    if attn + 2 * ffn + 3 * cache + slack <= VMEM_BUDGET:
        return 0
    for blk in (2048, 1024, 512, 256, 128):
        if fd % blk:
            continue
        blk_bytes = (d * 2 * blk + blk * d) * wsize
        if attn + 2 * blk_bytes + 4 * cache + slack <= VMEM_BUDGET:
            return blk
    return -1


def plan_layout(args):
    """Full kernel-layout plan: (attn_group, ffn_block), or None when no
    fused-decode-kernel layout fits VMEM (XLA scan applies).

    Tries in order: whole layer resident; FFN column-blocked; attention
    streamed per KV-head group + FFN blocked (the fully streamed form —
    nothing layer-sized in VMEM, demand `2*group + 2*blk + 4*cache_head`).
    """
    import jax.numpy as jnp

    fb = plan_ffn_block(args)
    if fb >= 0:
        return (False, fb)
    wsize = jnp.dtype(args.dtype).itemsize
    d, fd, hd = args.dim, args.hidden_dim, args.head_dim
    g = args.n_rep
    group = (d * (g + 2) * hd + g * hd * d) * wsize
    cache_head = 2 * args.max_seq_len * hd * jnp.dtype(args.kv_dtype).itemsize
    slack = 512 * 1024
    for blk in (2048, 1024, 512, 256, 128):
        if fd % blk:
            continue
        blk_bytes = (d * 2 * blk + blk * d) * wsize
        if 2 * group + 2 * blk_bytes + 4 * cache_head + slack <= VMEM_BUDGET:
            return (True, blk)
    return None


def plan_streamed(args):
    """Fourth kernel layout (8B class; VERDICT r1 #3): D-blocked QKV
    accumulation + M-blocked flash cache attention + column-blocked
    o-projection + FFN column blocks.  Nothing bigger than a sub-block of
    any weight is ever resident, so models whose per-KV-group weights exceed
    VMEM (llama3-8b widths: one group is ~10.5 MB bf16) still run fused.

    Returns (dq_block, m_block, do_block, ffn_block) minimizing grid steps
    under the VMEM budget, or None (XLA scan applies).  Consumes the same
    grouped+FFN-blocked param layout as the grouped kernel
    (checkpoint.fuse_param_tree(attn_group=True, ffn_block=...)).
    """
    import jax.numpy as jnp

    wsize = 1 if args.quant == "int8" else jnp.dtype(args.dtype).itemsize
    csize = jnp.dtype(args.kv_dtype).itemsize
    d, fd, hd = args.dim, args.hidden_dim, args.head_dim
    g, kvh, M = args.n_rep, args.kv_heads, args.max_seq_len
    qkvg = (g + 2) * hd
    gw = g * hd
    scratch = (6 * d + qkvg + (g + 3) * hd + 3 * g) * 4
    slack = 768 * 1024
    best = None
    for mb in (1024, 512, 256, 128):
        if M % mb:
            continue
        cache = 4 * mb * hd * csize  # k+v blocks, double-buffered
        for db in (4096, 2048, 1024, 512):
            if d % db:
                continue
            wq = 2 * db * qkvg * wsize
            for dob in (4096, 2048, 1024, 512):
                if d % dob:
                    continue
                wo = 2 * gw * dob * wsize
                for fb in (1024, 512, 256, 128):
                    if fd % fb:
                        continue
                    ffn = 2 * (d * 2 * fb + fb * d) * wsize
                    if (wq + wo + ffn + cache + scratch + slack
                            > VMEM_BUDGET):
                        continue
                    steps = kvh * (d // db + M // mb + d // dob) + fd // fb
                    if best is None or steps < best[0]:
                        best = (steps, (db, mb, dob, fb))
    return best[1] if best else None


def _scatter_rows(k_cache, v_cache, k_rows, v_rows, pos):
    """Write the kernel-emitted new K/V rows into the caches at `pos` with
    one XLA dynamic-update-slice each (in place under jit — the caches' only
    later use is as the next step's carry).  k_rows/v_rows: [NL, 1, KVH*HD]
    (lane-major, Mosaic cannot concatenate along sublanes) or
    [NL, KVH, 1, HD] from the grouped layout."""
    nl, kvh, m, hd = k_cache.shape
    if k_rows.ndim == 3:  # [NL, 1, KVH*HD] -> [NL, KVH, 1, HD]
        k_rows = k_rows.reshape(nl, 1, kvh, hd).transpose(0, 2, 1, 3)
        v_rows = v_rows.reshape(nl, 1, kvh, hd).transpose(0, 2, 1, 3)
    zero = jnp.int32(0)
    start = (zero, zero, pos.astype(jnp.int32), zero)
    return (jax.lax.dynamic_update_slice(k_cache, k_rows, start),
            jax.lax.dynamic_update_slice(v_cache, v_rows, start))


# --- shared kernel math (single source for all three grid layouts) ----------

def _make_rope_row(cos, sin, hd):
    """Split-halves RoPE on a [1, HD] lane row (cos/sin [1, HD//2])."""
    def rope_row(row):
        r1 = row[:, : hd // 2]
        r2 = row[:, hd // 2 :]
        return jnp.concatenate(
            [r1 * cos - r2 * sin, r1 * sin + r2 * cos], axis=-1
        )
    return rope_row


def _attend_head(q_rot, ks, vs, k_rot, v_new, visible, inv_sqrt_hd):
    """One query head against one KV head's cache rows [0, pos) plus the
    current token's (k_rot, v_new), which is NOT in the cache (the kernel
    never writes it there — the caller scatters it afterwards).

    q_rot/k_rot/v_new [1, HD] f32; ks/vs [M, HD] in the cache's native dtype
    (row `pos` stale/garbage, masked off); visible [1, M] = kv_idx < pos.
    Returns [1, HD] f32.  Numerically identical to softmax over rows
    [0, pos] with the new row written at `pos` (same score set, same max
    subtraction).  Low-precision caches dot natively (q cast down, f32
    accumulation) — the same contraction semantics as the XLA oracle's
    einsum over a bf16 cache, and ~2x the MXU rate of upcasting the whole
    [M, HD] block first."""
    scores = jax.lax.dot_general(
        q_rot.astype(ks.dtype), ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_hd
    scores = jnp.where(visible, scores, -jnp.inf)
    s_new = jnp.sum(q_rot * k_rot, axis=-1, keepdims=True) * inv_sqrt_hd
    smax = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_new)
    sexp = jnp.exp(scores - smax)
    e_new = jnp.exp(s_new - smax)
    denom = jnp.sum(sexp, axis=-1, keepdims=True) + e_new
    out = jnp.dot(sexp.astype(vs.dtype), vs,
                  preferred_element_type=jnp.float32) + e_new * v_new
    return out / denom


def _rms_scale(x, weight_row, eps):
    """RMSNorm of a [1, D] f32 row against a [1, D] weight ref value."""
    xn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return xn * weight_row.astype(jnp.float32)


def _wdot(x, w):
    """x @ w with f32 accumulation.  int8 weights (quantize_param_tree) are
    consumed via on-the-fly bf16 conversion — the caller applies the
    per-output scales to the f32 result."""
    if w.dtype == jnp.int8:
        return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _swiglu_block(zn, w_gu, w_dn, s_gu=None, s_dn=None):
    """One SwiGLU column block: zn [1, D] f32; w_gu [D, 2f]; w_dn [f, D].
    Returns the block's partial down-projection [1, D] f32.  int8 weights
    dequantize via the per-output scales: s_gu [1, 2f] applies BEFORE the
    SiLU nonlinearity, s_dn [1, D] after the down-projection."""
    fblk = w_dn.shape[0]
    gu = _wdot(zn, w_gu)
    if s_gu is not None:
        gu = gu * s_gu
    gate = gu[:, :fblk]
    ff = gate * (1.0 / (1.0 + jnp.exp(-gate))) * gu[:, fblk:]
    out = _wdot(ff, w_dn)
    return out * s_dn if s_dn is not None else out


def make_decode_kernel(n_heads: int, kv_heads: int, head_dim: int,
                       norm_eps: float):
    nh, kvh, hd, eps = n_heads, kv_heads, head_dim, norm_eps
    g = nh // kvh
    qd = nh * hd
    kvd = kvh * hd
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    def kernel(pos_ref,
               x_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref,
               attn_norm_ref, ffn_norm_ref, cos_ref, sin_ref,
               k_in_ref, v_in_ref,
               x_out_ref, k_rows_ref, v_rows_ref):
        layer = pl.program_id(0)
        pos = pos_ref[0]
        m = k_in_ref.shape[1]

        @pl.when(layer == 0)
        def _():
            x_out_ref[:] = x_ref[:]

        x = x_out_ref[:].astype(jnp.float32)  # [1, D]

        # --- attention -----------------------------------------------------
        xn = _rms_scale(x, attn_norm_ref[:], eps)
        w_qkv = wqkv_ref[:]
        qkv = jnp.dot(xn.astype(w_qkv.dtype), w_qkv,
                      preferred_element_type=jnp.float32)  # [1, QD+2*KVD]

        rope_row = _make_rope_row(cos_ref[:], sin_ref[:], hd)

        # All slicing stays on the lane axis — Mosaic cannot shape-cast lanes
        # into sublanes, so heads are a static Python loop (unrolled in the
        # kernel), not a reshaped dimension.  The cache is read-only; the new
        # token attends itself via the appended-score path in _attend_head.
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        visible = kv_idx < pos
        attn_heads = []
        k_rows, v_rows = [], []
        for h_kv in range(kvh):
            k_off = qd + h_kv * hd
            v_off = qd + kvd + h_kv * hd
            k_rot = rope_row(qkv[:, k_off : k_off + hd])           # [1, HD]
            v_new = qkv[:, v_off : v_off + hd]
            k_rows.append(k_rot)
            v_rows.append(v_new)
            ks = k_in_ref[h_kv]                                     # [M, HD]
            vs = v_in_ref[h_kv]
            for h_g in range(g):
                q_off = (h_kv * g + h_g) * hd
                q_rot = rope_row(qkv[:, q_off : q_off + hd])       # [1, HD]
                attn_heads.append(_attend_head(q_rot, ks, vs, k_rot, v_new,
                                               visible, inv_sqrt_hd))
        # Lane-axis concat ([1, KVH*HD]); sublane concat is unsupported.
        k_rows_ref[:] = jnp.concatenate(k_rows, axis=-1).astype(k_rows_ref.dtype)
        v_rows_ref[:] = jnp.concatenate(v_rows, axis=-1).astype(v_rows_ref.dtype)
        attn = jnp.concatenate(attn_heads, axis=-1)                # [1, QD]
        w_o = wo_ref[:]
        h = x + jnp.dot(attn.astype(w_o.dtype), w_o,
                        preferred_element_type=jnp.float32)

        # --- FFN -------------------------------------------------------------
        zn = _rms_scale(h, ffn_norm_ref[:], eps)
        h = h + _swiglu_block(zn, wgu_ref[:], wdown_ref[:])

        x_out_ref[:] = h.astype(x_out_ref.dtype)

    return kernel


def make_blocked_kernel(n_heads: int, kv_heads: int, head_dim: int,
                        norm_eps: float, nb: int):
    """Kernel for the FFN-blocked layout: grid (layers, ffn_blocks).

    j == 0 runs the attention half (weights resident for the whole layer —
    BlockSpecs index them by layer only, so Mosaic fetches once) and seeds
    the FFN scratches; every j accumulates one FFN column block; the last j
    writes the layer output.  Extends the fused kernel to models whose whole
    FFN cannot sit in VMEM (stories110M-class and up).
    """
    nh, kvh, hd, eps = n_heads, kv_heads, head_dim, norm_eps
    g = nh // kvh
    qd = nh * hd
    kvd = kvh * hd
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    def kernel(pos_ref,
               x_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref,
               attn_norm_ref, ffn_norm_ref, cos_ref, sin_ref,
               k_in_ref, v_in_ref,
               x_out_ref, k_rows_ref, v_rows_ref,
               h_s, zn_s, acc_s):
        layer = pl.program_id(0)
        j = pl.program_id(1)
        pos = pos_ref[0]
        m = k_in_ref.shape[1]

        @pl.when(jnp.logical_and(layer == 0, j == 0))
        def _():
            x_out_ref[:] = x_ref[:]

        @pl.when(j == 0)
        def _():
            x = x_out_ref[:].astype(jnp.float32)  # [1, D]
            xn = _rms_scale(x, attn_norm_ref[:], eps)
            w_qkv = wqkv_ref[:]
            qkv = jnp.dot(xn.astype(w_qkv.dtype), w_qkv,
                          preferred_element_type=jnp.float32)

            rope_row = _make_rope_row(cos_ref[:], sin_ref[:], hd)
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
            visible = kv_idx < pos
            attn_heads = []
            k_rows, v_rows = [], []
            for h_kv in range(kvh):
                k_off = qd + h_kv * hd
                v_off = qd + kvd + h_kv * hd
                k_rot = rope_row(qkv[:, k_off : k_off + hd])
                v_new = qkv[:, v_off : v_off + hd]
                k_rows.append(k_rot)
                v_rows.append(v_new)
                ks = k_in_ref[h_kv]
                vs = v_in_ref[h_kv]
                for h_g in range(g):
                    q_off = (h_kv * g + h_g) * hd
                    q_rot = rope_row(qkv[:, q_off : q_off + hd])
                    attn_heads.append(_attend_head(q_rot, ks, vs, k_rot,
                                                   v_new, visible,
                                                   inv_sqrt_hd))
            k_rows_ref[:] = jnp.concatenate(k_rows, axis=-1).astype(
                k_rows_ref.dtype)
            v_rows_ref[:] = jnp.concatenate(v_rows, axis=-1).astype(
                v_rows_ref.dtype)
            attn = jnp.concatenate(attn_heads, axis=-1)
            w_o = wo_ref[:]
            h = x + jnp.dot(attn.astype(w_o.dtype), w_o,
                            preferred_element_type=jnp.float32)
            h_s[:] = h
            zn_s[:] = _rms_scale(h, ffn_norm_ref[:], eps)
            acc_s[:] = jnp.zeros_like(acc_s)

        # FFN column block j (every grid step).
        acc_s[:] = acc_s[:] + _swiglu_block(zn_s[:], wgu_ref[:], wdown_ref[:])

        @pl.when(j == nb - 1)
        def _():
            x_out_ref[:] = (h_s[:] + acc_s[:]).astype(x_out_ref.dtype)

    return kernel


def _blocked_decode_layers(layers, x, pos, k_cache, v_cache, cos_row, sin_row,
                           *, n_heads, kv_heads, head_dim, norm_eps,
                           interpret=False):
    nl, d, qkv_d = layers["wqkv"].shape
    _, nb, _, gfd2 = layers["wgu"].shape
    fblk = layers["w_down"].shape[2]
    _, kvh, m, hd = k_cache.shape
    qd = n_heads * head_dim

    kernel = make_blocked_kernel(n_heads, kv_heads, head_dim, norm_eps, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, nb),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, d, qkv_d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, qd, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, None, d, gfd2), lambda l, j, sref: (l, j, 0, 0)),
            pl.BlockSpec((None, None, fblk, d), lambda l, j, sref: (l, j, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, kvh, m, hd), lambda l, j, sref: (l, 0, 0, 0)),
            pl.BlockSpec((None, kvh, m, hd), lambda l, j, sref: (l, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, 1, kvh * hd), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, 1, kvh * hd), lambda l, j, sref: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),  # h after attention
            pltpu.VMEM((1, d), jnp.float32),  # normalized FFN input
            pltpu.VMEM((1, d), jnp.float32),  # FFN accumulator
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((1, d), x.dtype),
        jax.ShapeDtypeStruct((nl, 1, kvh * hd), k_cache.dtype),
        jax.ShapeDtypeStruct((nl, 1, kvh * hd), v_cache.dtype),
    ]

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x, layers["wqkv"], layers["wo"], layers["wgu"], layers["w_down"],
        layers["attn_norm"], layers["ffn_norm"], cos_row, sin_row,
        k_cache, v_cache,
    )
    return x_out, *_scatter_rows(k_cache, v_cache, k_rows, v_rows, pos)


def make_grouped_kernel(n_heads: int, kv_heads: int, head_dim: int,
                        norm_eps: float, nb_ffn: int):
    """Kernel for the fully streamed layout: grid (layers, kvh + nb_ffn).

    Steps 0..KVH-1 each stream one KV-head group's attention weights
    (G query heads + its K/V columns + its wo rows) and that head's cache
    block, accumulating the o-projection; the remaining steps stream FFN
    column blocks.  Nothing layer-sized ever sits in VMEM, extending the
    fused decode kernel to TinyLlama-class models.
    """
    nh, kvh, hd, eps = n_heads, kv_heads, head_dim, norm_eps
    g = nh // kvh
    gw = g * hd
    nsteps = kvh + nb_ffn
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    def kernel(pos_ref,
               x_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref,
               attn_norm_ref, ffn_norm_ref, cos_ref, sin_ref,
               k_in_ref, v_in_ref,
               x_out_ref, k_row_ref, v_row_ref,
               xn_s, hacc_s, zn_s, facc_s):
        layer = pl.program_id(0)
        j = pl.program_id(1)
        pos = pos_ref[0]
        m = k_in_ref.shape[0]

        @pl.when(jnp.logical_and(layer == 0, j == 0))
        def _():
            x_out_ref[:] = x_ref[:]

        @pl.when(j == 0)
        def _():
            x = x_out_ref[:].astype(jnp.float32)
            xn_s[:] = _rms_scale(x, attn_norm_ref[:], eps)
            hacc_s[:] = jnp.zeros_like(hacc_s)

        rope_row = _make_rope_row(cos_ref[:], sin_ref[:], hd)

        @pl.when(j < kvh)
        def _():
            # This KV head's cache block (read-only; new row emitted apart).
            xn = xn_s[:]
            w = wqkv_ref[:]                      # [D, (G+2)*HD]
            qkv = jnp.dot(xn.astype(w.dtype), w,
                          preferred_element_type=jnp.float32)
            k_rot = rope_row(qkv[:, gw : gw + hd])
            v_new = qkv[:, gw + hd :]
            k_row_ref[:] = k_rot.astype(k_row_ref.dtype)
            v_row_ref[:] = v_new.astype(v_row_ref.dtype)
            ks = k_in_ref[:]                        # [M, HD]
            vs = v_in_ref[:]
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
            visible = kv_idx < pos
            heads = []
            for h_g in range(g):
                q_rot = rope_row(qkv[:, h_g * hd : (h_g + 1) * hd])
                heads.append(_attend_head(q_rot, ks, vs, k_rot, v_new,
                                          visible, inv_sqrt_hd))
            attn = jnp.concatenate(heads, axis=-1)   # [1, G*HD]
            w_o = wo_ref[:]                          # [G*HD, D]
            hacc_s[:] = hacc_s[:] + jnp.dot(
                attn.astype(w_o.dtype), w_o,
                preferred_element_type=jnp.float32)

        @pl.when(j == kvh - 1)
        def _():
            h = x_out_ref[:].astype(jnp.float32) + hacc_s[:]
            hacc_s[:] = h
            zn_s[:] = _rms_scale(h, ffn_norm_ref[:], eps)
            facc_s[:] = jnp.zeros_like(facc_s)

        @pl.when(j >= kvh)
        def _():
            facc_s[:] = facc_s[:] + _swiglu_block(zn_s[:], wgu_ref[:],
                                                  wdown_ref[:])

        @pl.when(j == nsteps - 1)
        def _():
            x_out_ref[:] = (hacc_s[:] + facc_s[:]).astype(x_out_ref.dtype)

    return kernel


def _grouped_decode_layers(layers, x, pos, k_cache, v_cache, cos_row, sin_row,
                           *, n_heads, kv_heads, head_dim, norm_eps,
                           interpret=False):
    nl, kvh_w, d, gqkv = layers["wqkv"].shape
    _, nb, _, gfd2 = layers["wgu"].shape
    fblk = layers["w_down"].shape[2]
    _, kvh, m, hd = k_cache.shape
    gw = (n_heads // kv_heads) * head_dim
    nsteps = kvh + nb

    kernel = make_grouped_kernel(n_heads, kv_heads, head_dim, norm_eps, nb)
    kv_i = lambda l, j, sref: (l, jnp.minimum(j, kvh - 1), 0, 0)
    ffn_i = lambda l, j, sref: (l, jnp.clip(j - kvh, 0, nb - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, nsteps),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, d, gqkv), kv_i),     # wqkv group
            pl.BlockSpec((None, None, gw, d), kv_i),       # wo group rows
            pl.BlockSpec((None, None, d, gfd2), ffn_i),    # wgu block
            pl.BlockSpec((None, None, fblk, d), ffn_i),    # w_down block
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, m, hd), kv_i),       # k cache head
            pl.BlockSpec((None, None, m, hd), kv_i),       # v cache head
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, 1, hd), kv_i),
            pl.BlockSpec((None, None, 1, hd), kv_i),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),  # normalized attention input
            pltpu.VMEM((1, d), jnp.float32),  # o-proj accumulator / h
            pltpu.VMEM((1, d), jnp.float32),  # normalized FFN input
            pltpu.VMEM((1, d), jnp.float32),  # FFN accumulator
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((1, d), x.dtype),
        jax.ShapeDtypeStruct((nl, kvh, 1, hd), k_cache.dtype),
        jax.ShapeDtypeStruct((nl, kvh, 1, hd), v_cache.dtype),
    ]

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x, layers["wqkv"], layers["wo"], layers["wgu"], layers["w_down"],
        layers["attn_norm"], layers["ffn_norm"], cos_row, sin_row,
        k_cache, v_cache,
    )
    return x_out, *_scatter_rows(k_cache, v_cache, k_rows, v_rows, pos)


def make_streamed_kernel(n_heads: int, kv_heads: int, head_dim: int,
                         norm_eps: float, ndq: int, nm: int, ndo: int,
                         nb: int, mb: int, quant: bool = False):
    """Kernel for the fully streamed 8B-class layout (plan_streamed).

    Grid (layers, KVH*(NDQ+NM+NDO) + NB).  Per KV-head group k:
      steps 0..NDQ-1      accumulate qkv_k over D-blocks of wqkv[k]
                          (dynamic 128-aligned lane reads of the normalized
                          hidden state — validated on Mosaic);
      steps ..+NM         flash cache attention, one [MB, HD] cache block per
                          step, all G query heads in a single MXU dot; the
                          current token's K/V is appended in the softmax at
                          the last M step (cache stays read-only, row `pos`
                          masked via kv_idx < pos);
      steps ..+NDO        o-projection one wo column block per step,
                          accumulated into the hidden state at dynamic
                          128-aligned lane offsets.
    The trailing NB steps stream SwiGLU column blocks.  Weight dots run in
    the weight dtype (bf16 on 8B) with f32 accumulation; attention dots in
    f32 like the other layouts.
    """
    nh, kvh, hd, eps = n_heads, kv_heads, head_dim, norm_eps
    g = nh // kvh
    gw = g * hd
    qkvg = (g + 2) * hd
    span = ndq + nm + ndo
    attn_steps = kvh * span
    nsteps = attn_steps + nb
    inv_sqrt_hd = 1.0 / math.sqrt(hd)

    def kernel(pos_ref, x_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref,
               *rest):
        if quant:
            (sqkv_ref, so_ref, sgu_ref, sdn_ref, *rest) = rest
        else:
            sqkv_ref = so_ref = sgu_ref = sdn_ref = None
        (attn_norm_ref, ffn_norm_ref, cos_ref, sin_ref,
         k_in_ref, v_in_ref,
         x_out_ref, k_row_ref, v_row_ref,
         xn_s, qkv_s, q_s, krot_s, vnew_s, m_s, l_s, acc_s,
         attn_s, hacc_s, zn_s, facc_s) = rest
        layer = pl.program_id(0)
        j = pl.program_id(1)
        pos = pos_ref[0]
        k_idx = j // span          # valid while j < attn_steps
        r = j - k_idx * span

        @pl.when(jnp.logical_and(layer == 0, j == 0))
        def _():
            x_out_ref[:] = x_ref[:]

        @pl.when(j == 0)
        def _():
            x = x_out_ref[:].astype(jnp.float32)
            xn_s[:] = _rms_scale(x, attn_norm_ref[:], eps)
            hacc_s[:] = x          # residual; o-proj blocks accumulate in

        in_attn = j < attn_steps
        rope_row = _make_rope_row(cos_ref[:], sin_ref[:], hd)

        # --- phase A: qkv accumulation over D blocks -------------------------
        @pl.when(jnp.logical_and(in_attn, r == 0))
        def _():
            qkv_s[:] = jnp.zeros_like(qkv_s)

        @pl.when(jnp.logical_and(in_attn, r < ndq))
        def _():
            db = wqkv_ref.shape[0]
            off = pl.multiple_of(r * db, db)
            xblk = xn_s[:, pl.ds(off, db)]
            qkv_s[:] = qkv_s[:] + _wdot(xblk, wqkv_ref[:])

        # --- phase B: flash attention over cache M blocks --------------------
        @pl.when(jnp.logical_and(in_attn, r == ndq))
        def _():
            # The D-block partials accumulate unscaled; dequantize the
            # finished projection once (per-output scales commute).
            qkv = qkv_s[:] * sqkv_ref[:] if quant else qkv_s[:]
            for h_g in range(g):
                q_s[h_g : h_g + 1] = rope_row(qkv[:, h_g * hd : (h_g + 1) * hd])
            k_rot = rope_row(qkv[:, gw : gw + hd])
            v_new = qkv[:, gw + hd :]
            krot_s[:] = k_rot
            vnew_s[:] = v_new
            k_row_ref[:] = k_rot.astype(k_row_ref.dtype)
            v_row_ref[:] = v_new.astype(v_row_ref.dtype)
            m_s[:] = jnp.full_like(m_s, -jnp.inf)
            l_s[:] = jnp.zeros_like(l_s)
            acc_s[:] = jnp.zeros_like(acc_s)

        @pl.when(jnp.logical_and(in_attn,
                                 jnp.logical_and(r >= ndq, r < ndq + nm)))
        def _():
            mi = r - ndq
            ks = k_in_ref[:].astype(jnp.float32)     # [MB, HD]
            vs = v_in_ref[:].astype(jnp.float32)
            q = q_s[:]                               # [G, HD] f32
            s = jax.lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_hd                          # [G, MB]
            kv_idx = mi * mb + jax.lax.broadcasted_iota(jnp.int32, (g, mb), 1)
            visible = kv_idx < pos
            s = jnp.where(visible, s, -jnp.inf)
            m = m_s[:]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            # A fully masked block keeps m_new == -inf until the first real
            # column; guard the rescale like blockwise_causal_attention.
            alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m - m_new))
            p = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(s - m_new))
            p = jnp.where(visible, p, 0.0)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_s[:] = acc_s[:] * alpha + jnp.dot(
                p, vs, preferred_element_type=jnp.float32)
            m_s[:] = m_new

            @pl.when(mi == nm - 1)
            def _():
                # Append the current token's score/value (its K/V is NOT in
                # the cache; the caller scatters the emitted rows afterward).
                s_new = jnp.sum(q_s[:] * krot_s[:], axis=-1,
                                keepdims=True) * inv_sqrt_hd   # [G, 1]
                m2 = jnp.maximum(m_s[:], s_new)
                alpha2 = jnp.exp(m_s[:] - m2)
                e_new = jnp.exp(s_new - m2)
                l_s[:] = l_s[:] * alpha2 + e_new
                acc_s[:] = acc_s[:] * alpha2 + e_new * vnew_s[:]
                m_s[:] = m2

        # --- phase C: o-projection column blocks ----------------------------
        @pl.when(jnp.logical_and(in_attn, r == ndq + nm))
        def _():
            heads = [acc_s[h : h + 1] / l_s[h : h + 1] for h in range(g)]
            attn_s[:] = jnp.concatenate(heads, axis=-1)      # [1, GW]

        @pl.when(jnp.logical_and(in_attn, r >= ndq + nm))
        def _():
            dob = wo_ref.shape[1]
            off = pl.multiple_of((r - ndq - nm) * dob, dob)
            part = _wdot(attn_s[:], wo_ref[:])               # [1, DOB]
            if quant:
                part = part * so_ref[:]
            hacc_s[:, pl.ds(off, dob)] = hacc_s[:, pl.ds(off, dob)] + part

        # --- FFN column blocks ----------------------------------------------
        @pl.when(j == attn_steps)
        def _():
            zn_s[:] = _rms_scale(hacc_s[:], ffn_norm_ref[:], eps)
            facc_s[:] = jnp.zeros_like(facc_s)

        @pl.when(j >= attn_steps)
        def _():
            facc_s[:] = facc_s[:] + _swiglu_block(
                zn_s[:], wgu_ref[:], wdown_ref[:],
                s_gu=sgu_ref[:] if quant else None,
                s_dn=sdn_ref[:] if quant else None)

        @pl.when(j == nsteps - 1)
        def _():
            x_out_ref[:] = (hacc_s[:] + facc_s[:]).astype(x_out_ref.dtype)

    return kernel


def _streamed_decode_layers(layers, x, pos, k_cache, v_cache, cos_row,
                            sin_row, stream_plan, *, n_heads, kv_heads,
                            head_dim, norm_eps, interpret=False):
    db, mb, dob, fb = stream_plan
    nl, kvh_w, d, qkvg = layers["wqkv"].shape
    _, nbf, _, gfd2 = layers["wgu"].shape
    fblk = layers["w_down"].shape[2]
    _, kvh, m, hd = k_cache.shape
    gw = (n_heads // kv_heads) * head_dim
    assert fblk == fb and d % db == 0 and m % mb == 0 and d % dob == 0, \
        (fblk, fb, d, db, m, mb, dob)
    ndq, nm, ndo, nb = d // db, m // mb, d // dob, nbf
    span = ndq + nm + ndo
    attn_steps = kvh * span
    nsteps = attn_steps + nb
    quant = "wqkv_scale" in layers

    kernel = make_streamed_kernel(n_heads, kv_heads, head_dim, norm_eps,
                                  ndq, nm, ndo, nb, mb, quant=quant)

    def k_of(j):
        return jnp.minimum(j // span, kvh - 1)

    def r_of(j):
        return j - jnp.minimum(j // span, kvh - 1) * span

    scale_specs, scale_args = [], []
    if quant:
        scale_specs = [
            pl.BlockSpec((None, None, 1, qkvg),
                         lambda l, j, sref: (l, k_of(j), 0, 0)),
            pl.BlockSpec((None, None, 1, dob),
                         lambda l, j, sref: (l, k_of(j), 0,
                                             jnp.clip(r_of(j) - ndq - nm,
                                                      0, ndo - 1))),
            pl.BlockSpec((None, None, 1, gfd2),
                         lambda l, j, sref: (l, jnp.clip(j - attn_steps,
                                                         0, nb - 1), 0, 0)),
            pl.BlockSpec((None, None, 1, d),
                         lambda l, j, sref: (l, jnp.clip(j - attn_steps,
                                                         0, nb - 1), 0, 0)),
        ]
        scale_args = [layers["wqkv_scale"], layers["wo_scale"],
                      layers["wgu_scale"], layers["w_down_scale"]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, nsteps),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, db, qkvg),
                         lambda l, j, sref: (l, k_of(j),
                                             jnp.clip(r_of(j), 0, ndq - 1), 0)),
            pl.BlockSpec((None, None, gw, dob),
                         lambda l, j, sref: (l, k_of(j), 0,
                                             jnp.clip(r_of(j) - ndq - nm,
                                                      0, ndo - 1))),
            pl.BlockSpec((None, None, d, gfd2),
                         lambda l, j, sref: (l, jnp.clip(j - attn_steps,
                                                         0, nb - 1), 0, 0)),
            pl.BlockSpec((None, None, fb, d),
                         lambda l, j, sref: (l, jnp.clip(j - attn_steps,
                                                         0, nb - 1), 0, 0)),
            *scale_specs,
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, j, sref: (l, 0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((1, hd // 2), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, mb, hd),
                         lambda l, j, sref: (l, k_of(j),
                                             jnp.clip(r_of(j) - ndq,
                                                      0, nm - 1), 0)),
            pl.BlockSpec((None, None, mb, hd),
                         lambda l, j, sref: (l, k_of(j),
                                             jnp.clip(r_of(j) - ndq,
                                                      0, nm - 1), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, j, sref: (0, 0)),
            pl.BlockSpec((None, None, 1, hd),
                         lambda l, j, sref: (l, k_of(j), 0, 0)),
            pl.BlockSpec((None, None, 1, hd),
                         lambda l, j, sref: (l, k_of(j), 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),       # xn
            pltpu.VMEM((1, qkvg), jnp.float32),    # qkv accumulator
            pltpu.VMEM((n_heads // kv_heads, hd), jnp.float32),  # roped q
            pltpu.VMEM((1, hd), jnp.float32),      # roped k
            pltpu.VMEM((1, hd), jnp.float32),      # new v
            pltpu.VMEM((n_heads // kv_heads, 1), jnp.float32),   # running max
            pltpu.VMEM((n_heads // kv_heads, 1), jnp.float32),   # normalizer
            pltpu.VMEM((n_heads // kv_heads, hd), jnp.float32),  # attn acc
            pltpu.VMEM((1, gw), jnp.float32),      # merged attn heads
            pltpu.VMEM((1, d), jnp.float32),       # hidden accumulator
            pltpu.VMEM((1, d), jnp.float32),       # normalized FFN input
            pltpu.VMEM((1, d), jnp.float32),       # FFN accumulator
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((1, d), x.dtype),
        jax.ShapeDtypeStruct((nl, kvh, 1, hd), k_cache.dtype),
        jax.ShapeDtypeStruct((nl, kvh, 1, hd), v_cache.dtype),
    ]

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x, layers["wqkv"], layers["wo"], layers["wgu"], layers["w_down"],
        *scale_args,
        layers["attn_norm"], layers["ffn_norm"], cos_row, sin_row,
        k_cache, v_cache,
    )
    return x_out, *_scatter_rows(k_cache, v_cache, k_rows, v_rows, pos)


def decode_layers(layers: Dict, x: jax.Array, pos: jax.Array,
                  k_cache: jax.Array, v_cache: jax.Array,
                  cos_row: jax.Array, sin_row: jax.Array,
                  *, n_heads: int, kv_heads: int, head_dim: int,
                  norm_eps: float, interpret: bool = False,
                  stream_plan: tuple = ()
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run all layers of one decode step in one fused kernel.

    layers: fused layer tree ("wqkv" [NL,D,QD+2KVD], "wo" [NL,QD,D],
            "wgu" [NL,D,2FD], "w_down" [NL,FD,D], "attn_norm"/"ffn_norm"
            [NL,D]) in rope-split layout.
    x: [1, D] hidden state (embedded token).
    k_cache/v_cache: [NL, KVH, M, HD] (single batch row).  The kernel reads
    them (row `pos` masked off) and emits the new rows; this wrapper
    scatters the rows back at `pos` with an in-place dynamic-update-slice.
    cos_row/sin_row: [1, HD//2] RoPE rows for `pos`.

    Returns (x_out [1, D], k_cache, v_cache) with the caches updated at `pos`.
    """
    if stream_plan:  # fully streamed 8B-class layout (plan_streamed)
        return _streamed_decode_layers(
            layers, x, pos, k_cache, v_cache, cos_row, sin_row, stream_plan,
            n_heads=n_heads, kv_heads=kv_heads, head_dim=head_dim,
            norm_eps=norm_eps, interpret=interpret,
        )
    if layers["wqkv"].ndim == 4:  # KV-head-grouped + FFN-blocked layout
        return _grouped_decode_layers(
            layers, x, pos, k_cache, v_cache, cos_row, sin_row,
            n_heads=n_heads, kv_heads=kv_heads, head_dim=head_dim,
            norm_eps=norm_eps, interpret=interpret,
        )
    if layers["wgu"].ndim == 4:  # FFN-blocked layout -> (layers, blocks) grid
        return _blocked_decode_layers(
            layers, x, pos, k_cache, v_cache, cos_row, sin_row,
            n_heads=n_heads, kv_heads=kv_heads, head_dim=head_dim,
            norm_eps=norm_eps, interpret=interpret,
        )
    nl, d, qkv_d = layers["wqkv"].shape
    fd = layers["w_down"].shape[1]
    _, kvh, m, hd = k_cache.shape
    qd = n_heads * head_dim
    gfd = layers["wgu"].shape[2]

    kernel = make_decode_kernel(n_heads, kv_heads, head_dim, norm_eps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl,),
        in_specs=[
            pl.BlockSpec((1, d), lambda l, sref: (0, 0)),                  # x
            pl.BlockSpec((None, d, qkv_d), lambda l, sref: (l, 0, 0)),     # wqkv
            pl.BlockSpec((None, qd, d), lambda l, sref: (l, 0, 0)),        # wo
            pl.BlockSpec((None, d, gfd), lambda l, sref: (l, 0, 0)),       # wgu
            pl.BlockSpec((None, fd, d), lambda l, sref: (l, 0, 0)),        # w_down
            pl.BlockSpec((None, 1, d), lambda l, sref: (l, 0, 0)),         # attn_norm [1,D]
            pl.BlockSpec((None, 1, d), lambda l, sref: (l, 0, 0)),         # ffn_norm [1,D]
            pl.BlockSpec((1, hd // 2), lambda l, sref: (0, 0)),            # cos
            pl.BlockSpec((1, hd // 2), lambda l, sref: (0, 0)),            # sin
            pl.BlockSpec((None, kvh, m, hd), lambda l, sref: (l, 0, 0, 0)),  # k in
            pl.BlockSpec((None, kvh, m, hd), lambda l, sref: (l, 0, 0, 0)),  # v in
        ],
        out_specs=[
            pl.BlockSpec((1, d), lambda l, sref: (0, 0)),                # x out
            pl.BlockSpec((None, 1, kvh * hd), lambda l, sref: (l, 0, 0)),  # k rows
            pl.BlockSpec((None, 1, kvh * hd), lambda l, sref: (l, 0, 0)),  # v rows
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((1, d), x.dtype),
        jax.ShapeDtypeStruct((nl, 1, kvh * hd), k_cache.dtype),
        jax.ShapeDtypeStruct((nl, 1, kvh * hd), v_cache.dtype),
    ]

    x_out, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # The layer walk is a sequential dependence chain (x carries across
        # grid steps); forbid any grid reordering.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x, layers["wqkv"], layers["wo"], layers["wgu"], layers["w_down"],
        layers["attn_norm"], layers["ffn_norm"], cos_row, sin_row,
        k_cache, v_cache,
    )
    return x_out, *_scatter_rows(k_cache, v_cache, k_rows, v_rows, pos)
