"""Llama-family model: pure-functional forward + a stateful engine wrapper.

The forward pass is a pytree-in / pytree-out function (`forward_hidden`,
`forward`) suitable for `jax.jit` / `pjit`: parameters are the stacked tree
from `checkpoint.build_param_tree`, KV state is an explicit carry
(`kvcache.init_cache`), and the layer loop is one `lax.scan` over the stacked
layer weights and cache slices.

The `Llama` class reproduces the reference's object API — construction from a
checkpoint path, `model(input_ids, start_pos) -> [B, 1, VS]` logits,
`model.generate(input_ids, max_new_tokens)` yielding one token at a time
(reference llama3.py:264-321) — while internally owning device arrays and a
cache of jitted step functions.  `generate` runs the fused on-device
prefill + `lax.scan` decode loop (see `generate.py`) and streams the result,
so the reference's per-token Python dispatch cost (SURVEY §3.2) never occurs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelArgs
from ..checkpoint import build_param_tree, load_parameters
from ..kvcache import init_cache
from ..ops import core as ops


class StaticConfig(NamedTuple):
    """Hashable structural config closed over by jitted functions."""
    n_heads: int
    kv_heads: int
    head_dim: int
    norm_eps: float
    precision: Any  # jax.lax.Precision or None
    fused: bool = False   # params carry wqkv / wgu instead of wq/wk/wv, w_gate/w_up
    unroll: int = 1       # layer-scan unroll factor
    rope_split: bool = False  # wq/wk permuted to split-halves RoPE layout
    kv_block: int = 512       # blockwise-attention block (0 = always dense)
    flash_prefill: bool = False  # Pallas flash kernel for first-chunk prefill
    paged_kernel: int = 0     # paged decode attention: 0=XLA gather,
                              # 1=Pallas page-streaming, 2=Pallas interpreted
    stream_plan: tuple = ()   # 8B-class fused decode: (dq_block, m_block,
                              # do_block, ffn_block); () = not streamed
    sharded: bool = False     # params/caches ride a mesh: serving commits
                              # keep the multi-axis scatter (KVH stays a
                              # sharded window dim; the single-chip flat
                              # form would merge it away in a reshape)

    @classmethod
    def from_args(cls, args: ModelArgs, precision=None, fused=False,
                  unroll=1, rope_split=False) -> "StaticConfig":
        on_tpu = jax.default_backend() != "cpu"
        flash = args.attn_impl in ("auto", "pallas") and on_tpu
        if args.attn_impl in ("auto", "pallas") and on_tpu:
            paged = 1
        elif args.attn_impl == "pallas":  # CPU: interpret mode (tests)
            paged = 2
        else:
            paged = 0
        return cls(args.n_heads, args.kv_heads, args.head_dim, args.norm_eps,
                   precision, fused, unroll, rope_split,
                   getattr(args, "prefill_kv_block", 512), flash, paged)


def _device_put_params(params: Dict) -> Dict:
    """Single-chip parameter placement.  int4 leaves upload as int8 BYTES
    and convert to s4 inside a jitted program whose OUTPUT layout is pinned
    to the packed sub-byte form (sub_byte_element_size_in_bits=4, the
    tiling every s4 matmul consumer asks for): a host-uploaded int4 array
    is born UNPACKED (sub_byte 0, one byte per nibble — no memory win and
    a layout mismatch), and this backend cannot relayout a committed array
    (device_put-with-layout recurses in its jit dispatch).  Probed on
    hardware: the pinned-out-layout convert births packed s4 that every
    downstream program consumes with zero copies."""
    import ml_dtypes

    on_tpu = jax.default_backend() != "cpu"
    convs = {}

    def conv_for(ndim: int):
        if ndim not in convs:
            if on_tpu:
                from jax.experimental.layout import Format, Layout
                from jax.sharding import SingleDeviceSharding
                lay = Layout(major_to_minor=tuple(range(ndim)),
                             tiling=((64, 128), (8, 1)),
                             sub_byte_element_size_in_bits=4)
                fmt = Format(lay, SingleDeviceSharding(jax.devices()[0]))
                convs[ndim] = jax.jit(lambda a: a.astype(jnp.int4),
                                      out_shardings=fmt)
            else:
                convs[ndim] = jax.jit(lambda a: a.astype(jnp.int4))
        return convs[ndim]

    def put(x):
        if getattr(x, "dtype", None) == ml_dtypes.int4:
            x8 = jnp.asarray(np.asarray(x).view(np.int8))
            return conv_for(x8.ndim)(x8)
        return jax.device_put(jnp.asarray(x))

    return jax.tree.map(put, params)


def embed_tokens(params: Dict, ids) -> jax.Array:
    """Embedding gather; dequantizes int8 rows with their per-row scale
    (checkpoint.quantize_param_tree)."""
    h = jnp.take(params["tok_embedding"], ids, axis=0)
    s = params.get("tok_embedding_scale")
    if s is None:
        return h
    row_s = jnp.take(s[:, 0], ids, axis=0)[..., None]
    return (h.astype(jnp.float32) * row_s).astype(params["norm"].dtype)


def lm_logits(params: Dict, h, precision) -> jax.Array:
    """Final projection to vocab logits [.., VS] in f32; int8 lm_head
    dequantizes via the per-column scale post-multiply."""
    logits = jnp.dot(h, params["lm_head"], precision=precision,
                     preferred_element_type=jnp.float32)
    s = params.get("lm_head_scale")
    return logits * s if s is not None else logits


def _split_qkv(x, lp: Dict, cfg: "StaticConfig", B, L):
    """Q/K/V projections on split weights (the TP layout); int8 weights
    dequantize via the per-output-channel scale post-multiply."""
    def proj(name, heads):
        out = jnp.dot(x, lp[name], precision=cfg.precision,
                      preferred_element_type=jnp.float32)
        s = lp.get(name + "_scale")
        if s is not None:
            out = out * s
        return out.astype(x.dtype).reshape(B, L, heads, cfg.head_dim)

    return (proj("wq", cfg.n_heads), proj("wk", cfg.kv_heads),
            proj("wv", cfg.kv_heads))


def _lora_delta(x, ll: Dict, t: str, scale, precision):
    """Low-rank serving delta for ONE layer's single-adapter slices
    (ll[f"{t}_a"] [in, r], ll[f"{t}_b"] [r, out]) — 0 when `t` is not an
    adapted target.  The adapted matmul stays x@W + scale*(x@A)@B; W + AB
    is never materialized (lora.py design)."""
    if ll is None or f"{t}_a" not in ll:
        return 0
    u = jnp.dot(x, ll[f"{t}_a"], precision=precision,
                preferred_element_type=jnp.float32)
    return scale * jnp.dot(u.astype(x.dtype), ll[f"{t}_b"],
                           precision=precision,
                           preferred_element_type=jnp.float32)


def _layer_step(cfg: StaticConfig, first_chunk: bool, pos, cos, sin,
                h, lp: Dict, ck, cv, ll: Dict = None, lora_scale=1.0):
    """One transformer block. h: [B, L, D]; ck/cv: this layer's cache slice.
    ll: one layer's single-adapter LoRA slices (serving admissions prefill
    the request's adapter through here — multi-LoRA serving)."""
    B, L, D = h.shape
    x = ops.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
    if cfg.fused:
        # Single-chip fast path: one matmul for Q|K|V (dispatch-overhead
        # reduction for small-model decode; TP keeps the split weights).
        q, k, v = ops.fused_qkv(x, lp["wqkv"], cfg.n_heads, cfg.kv_heads,
                                cfg.head_dim, precision=cfg.precision,
                                scale=lp.get("wqkv_scale"))
    else:
        q, k, v = _split_qkv(x, lp, cfg, B, L)
    if ll is not None:
        def add(t, y, heads):
            if f"{t}_a" not in ll:
                return y
            d = _lora_delta(x, ll, t, lora_scale, cfg.precision)
            return y + d.astype(y.dtype).reshape(B, L, heads, cfg.head_dim)
        q = add("wq", q, cfg.n_heads)
        k = add("wk", k, cfg.kv_heads)
        v = add("wv", v, cfg.kv_heads)
    rope = ops.apply_rope_split if cfg.rope_split else ops.apply_rope
    q = rope(q, cos, sin)
    k = rope(k, cos, sin)
    ck, cv = ops.update_kv_cache(ck, cv, k, v, pos)
    blockwise = (cfg.kv_block > 0 and L % cfg.kv_block == 0
                 and L >= 2 * cfg.kv_block)
    if first_chunk:
        if cfg.flash_prefill:
            from ..ops.kernels import flash_prefill as fp
            flash_ok = fp.supports(L)
        else:
            flash_ok = False
        if flash_ok:
            attn = fp.flash_prefill(q, k, v)
        elif blockwise:
            # Long prefill: flash-semantics accumulation bounds peak memory
            # at O(L * kv_block) instead of the O(L^2) dense score tensor.
            attn = ops.blockwise_causal_attention(
                q, k, v, pos, cfg.kv_block, precision=cfg.precision)
        else:
            # start_pos == 0 prefill: history is exactly this block.
            attn = ops.causal_attention(q, k, v, precision=cfg.precision)
    elif L > 1 and cfg.kv_block > 0 and ck.shape[2] % cfg.kv_block == 0 \
            and ck.shape[2] >= 2 * cfg.kv_block:
        # Long chunked prefill against the cache.
        attn = ops.blockwise_causal_attention(
            q, ck.transpose(0, 2, 1, 3), cv.transpose(0, 2, 1, 3), pos,
            cfg.kv_block, precision=cfg.precision)
    else:
        attn = ops.cache_attention(q, ck, cv, pos, precision=cfg.precision)
    lora_cb = None
    if ll is not None:
        def lora_cb(t, xin):
            if f"{t}_a" not in ll:
                return None
            return _lora_delta(xin, ll, t, lora_scale, cfg.precision)
    h = h + ops.fused_o_proj(attn, lp["wo"], precision=cfg.precision,
                             scale=lp.get("wo_scale"),
                             lora=lora_cb).astype(h.dtype)
    z = ops.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
    if cfg.fused:
        h = h + ops.fused_ffn(z, lp["wgu"], lp["w_down"],
                              precision=cfg.precision,
                              scale_gu=lp.get("wgu_scale"),
                              scale_down=lp.get("w_down_scale"))
    else:
        h = h + ops.swiglu(z, lp["w_gate"], lp["w_up"], lp["w_down"],
                           precision=cfg.precision,
                           s_gate=lp.get("w_gate_scale"),
                           s_up=lp.get("w_up_scale"),
                           s_down=lp.get("w_down_scale"),
                           lora=lora_cb)
    return h, ck, cv


def forward_hidden(params: Dict, input_ids, pos, cache: Dict,
                   cos, sin, cfg: StaticConfig, first_chunk: bool,
                   lora=None):
    """Embed -> N blocks (lax.scan) -> pre-norm hidden states.

    input_ids: [B, L] int32 (L static); pos: scalar int32.
    Returns (h [B, L, D], updated cache).

    lora: optional SINGLE-adapter tree {"layers": {t_a: [NL, in, r],
    t_b: [NL, r, out]}, "scale": alpha/r} — the serving admission path
    prefills a request through its adapter (multi-LoRA serving).
    """
    L = input_ids.shape[1]
    h = embed_tokens(params, input_ids)
    cos_l = jax.lax.dynamic_slice_in_dim(cos, pos, L)
    sin_l = jax.lax.dynamic_slice_in_dim(sin, pos, L)
    lscale = lora["scale"] if lora is not None else 1.0

    def step(h, xs):
        if lora is not None:
            lp, ck, cv, ll = xs
        else:
            (lp, ck, cv), ll = xs, None
        h, ck, cv = _layer_step(cfg, first_chunk, pos, cos_l, sin_l, h, lp,
                                ck, cv, ll=ll, lora_scale=lscale)
        return h, (ck, cv)

    xs = (params["layers"], cache["k"], cache["v"])
    if lora is not None:
        xs = (*xs, lora["layers"])
    h, (ck_new, cv_new) = jax.lax.scan(step, h, xs, unroll=cfg.unroll)
    return h, {"k": ck_new, "v": cv_new}


def forward(params: Dict, input_ids, pos, cache: Dict, cos, sin,
            cfg: StaticConfig, first_chunk: bool):
    """Full forward returning last-position logits [B, 1, VS] (the reference
    never materializes [B, L, VS]; quirk Q8, reference llama3.py:307)."""
    h, cache = forward_hidden(params, input_ids, pos, cache, cos, sin, cfg, first_chunk)
    h = ops.rms_norm(h[:, -1:, :], params["norm"], cfg.norm_eps)
    return lm_logits(params, h, cfg.precision), cache


def gather_lora_rows(lora_layers: Dict, adapter_ids) -> Dict:
    """Per-row adapter factors: {t: [NL, NA, ...]} gathered by
    adapter_ids [B] -> {t: [NL, B, ...]}.  Hoisted out of the quantum scan
    (adapter assignments are frozen per dispatch) like the int8 pool-scale
    rows."""
    return {name: bank[:, adapter_ids] for name, bank in lora_layers.items()}


def forward_ragged_decode(params: Dict, tokens, pos, cache: Dict, cos, sin,
                          cfg: StaticConfig, block_table=None,
                          pos0=None, win=None, win_count=None,
                          commit=True, scale_rows=None,
                          lora=None, adapter_ids=None, lora_rows=None):
    """One decode step where every batch row sits at its own position.

    tokens: [B] int32; pos: [B] int32 (row b's token goes to slot pos[b] and
    attends kv_idx <= pos[b]).  Returns (logits [B, VS], cache).  This is the
    continuous-batching step: rows may belong to different requests at
    different sequence lengths.

    Dense mode (block_table None): cache k/v are [NL, B, KVH, M, HD].
    Paged mode: cache k/v are page pools [NL, P, KVH, page_size, HD] and
    block_table [B, max_pages] maps each row's pages (kvcache.init_paged_cache).
    int8 caches (kv_quant="int8") additionally carry per-(token, kv-head)
    scale arrays "k_s"/"v_s"; new K/V rows quantize at write
    (ops.quantize_kv_rows) and attention dequantizes via the commuting
    post-scales — dense or paged, XLA or Pallas kernel.

    The cache/pool is a LOOP-INVARIANT input of the layer scan (round-3
    restructure): attention masks strictly to kv_idx < pos and folds the
    current token's K/V in as an explicit appended column, each layer emits
    only its new [B, KVH, HD] rows as scan outputs, and one post-scan
    scatter commits all layers' rows into the donated cache in place.  The
    previous form threaded the whole pool through the scan as xs/ys, which
    re-sliced and re-stacked pool-sized buffers every layer — at full-8B
    serving shapes (4.3 GB pool) that copy traffic, not compute, dominated
    the step (~3.7x the parameter-bytes floor, BENCHMARKS.md round 3).

    Deferred-commit mode (the round-4 extension, used by the quantum
    scans): pos0 [B] is the dispatch-start position (the cache holds only
    tokens < pos0 — it is NOT a scan carry, so XLA never double-buffers
    pool-sized copies), `win` holds the quantum's in-flight K/V rows
    ({"k"/"v": [NL, B, KVH, Q, HD]} + scales when quantized), win_count the
    number of valid window columns, and commit=False returns
    (logits, new_rows) with new_rows = (k, v[, k_s, v_s]) each
    [NL, B, KVH, ...] for the caller to insert into the window.

    scale_rows (paged int8 quantum scans): the pre-gathered
    (k_rows, v_rows) [NL, B, KVH, maxp*page] from
    ops.gather_page_scales_all — the pool scales are frozen for the whole
    quantum, so the caller hoists the gather out of the scan and each
    layer takes its slice here instead of re-gathering.

    Multi-LoRA serving: `lora` is the engine's stacked adapter bank
    ({"layers": {t_a: [NL, NA, in, r], t_b: [NL, NA, r, out]},
    "scale": alpha/r}; adapter 0 is all-zero = base model) and
    adapter_ids [B] selects each row's adapter.  `lora_rows` is the
    per-row pre-gather ({t: [NL, B, ...]}, gather_lora_rows) — quantum
    scans hoist it (adapter assignments are frozen per dispatch); when
    absent it is gathered here.
    """
    if lora is not None and lora_rows is None:
        lora_rows = gather_lora_rows(lora["layers"], adapter_ids)
    B = tokens.shape[0]
    quant = "k_s" in cache
    if pos0 is None:
        pos0 = pos
    if block_table is not None and commit:
        page = cache["k"].shape[3]
        page_ids = jnp.take_along_axis(
            block_table, (pos // page)[:, None], axis=1
        )[:, 0]
        offsets = pos % page
    kc_all, vc_all = cache["k"], cache["v"]
    ks_all, vs_all = cache.get("k_s"), cache.get("v_s")
    NL = kc_all.shape[0]
    kv_dt = kc_all.dtype
    h = embed_tokens(params, tokens[:, None])  # [B, 1, D]
    cos_b = jnp.take(cos, pos, axis=0)  # [B, HD//2]
    sin_b = jnp.take(sin, pos, axis=0)

    def rope_rows(x):  # [B, 1, H, HD] with per-row tables
        hd = x.shape[-1]
        if cfg.rope_split:
            x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
        else:
            xp = x.reshape(*x.shape[:-1], hd // 2, 2)
            x1, x2 = xp[..., 0], xp[..., 1]
        c = cos_b[:, None, None, :]
        s = sin_b[:, None, None, :]
        r1 = x1 * c - x2 * s
        r2 = x1 * s + x2 * c
        if cfg.rope_split:
            return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
        return jnp.stack([r1, r2], axis=-1).reshape(x.shape).astype(x.dtype)

    def step(h, xs):
        li, lp = xs
        x = ops.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        if cfg.fused:
            q, k, v = ops.fused_qkv(x, lp["wqkv"], cfg.n_heads, cfg.kv_heads,
                                    cfg.head_dim, precision=cfg.precision,
                                    scale=lp.get("wqkv_scale"))
        else:
            q, k, v = _split_qkv(x, lp, cfg, B, 1)
        lora_cb = None
        if lora_rows is not None:
            ll = {name: jax.lax.dynamic_index_in_dim(rows, li, 0,
                                                     keepdims=False)
                  for name, rows in lora_rows.items()}  # {t: [B, ...]}
            lscale = lora["scale"]

            def lora_cb(t, xin):
                # Per-row low-rank delta: xin [B, 1, in] against row b's
                # adapter factors ll[t_a] [B, in, r] / ll[t_b] [B, r, out].
                if f"{t}_a" not in ll:
                    return None
                u = jnp.einsum("bli,bir->blr", xin, ll[f"{t}_a"],
                               precision=cfg.precision,
                               preferred_element_type=jnp.float32)
                return lscale * jnp.einsum(
                    "blr,bro->blo", u.astype(xin.dtype), ll[f"{t}_b"],
                    precision=cfg.precision,
                    preferred_element_type=jnp.float32)

            def addqkv(t, y, heads):
                d = lora_cb(t, x)
                if d is None:
                    return y
                return y + d.astype(y.dtype).reshape(B, 1, heads,
                                                     cfg.head_dim)
            q = addqkv("wq", q, cfg.n_heads)
            k = addqkv("wk", k, cfg.kv_heads)
            v = addqkv("wv", v, cfg.kv_heads)
        q = rope_rows(q)
        k = rope_rows(k)
        if quant:
            k8, k_s = ops.quantize_kv_rows(k)  # [B, 1, KVH, HD] + [B,1,KVH]
            v8, v_s = ops.quantize_kv_rows(v)
            cur_k, cur_v = k8[:, 0], v8[:, 0]
            cur_ks, cur_vs = k_s[:, 0], v_s[:, 0]
        else:
            cur_k = k[:, 0].astype(kv_dt)  # pool dtype: match a read-back
            cur_v = v[:, 0].astype(kv_dt)
            cur_ks = cur_vs = None
        wk = wv = wks = wvs = None
        if win is not None:
            wk = jax.lax.dynamic_index_in_dim(win["k"], li, 0,
                                              keepdims=False)
            wv = jax.lax.dynamic_index_in_dim(win["v"], li, 0,
                                              keepdims=False)
            if quant:
                wks = jax.lax.dynamic_index_in_dim(win["k_s"], li, 0,
                                                   keepdims=False)
                wvs = jax.lax.dynamic_index_in_dim(win["v_s"], li, 0,
                                                   keepdims=False)
        if block_table is not None:
            from ..ops.kernels import paged_attention as pk
            # Compiled kernel needs 128-aligned head_dim for its manual page
            # DMAs (pk.supports); interpret mode (tests) takes any shape.
            # Window mode (deferred-commit quantum scans) passes the
            # in-flight rows as an extra VMEM block the kernel folds in.
            if cfg.paged_kernel == 2 or (
                    cfg.paged_kernel == 1
                    and pk.supports(cfg.head_dim, kc_all.shape[3], kv_dt)):
                kr = vr = None
                if quant and scale_rows is not None:
                    kr = jax.lax.dynamic_index_in_dim(scale_rows[0], li, 0,
                                                      keepdims=False)
                    vr = jax.lax.dynamic_index_in_dim(scale_rows[1], li, 0,
                                                      keepdims=False)
                elif quant:
                    kr = ops.gather_page_scales_stacked(ks_all, li,
                                                        block_table)
                    vr = ops.gather_page_scales_stacked(vs_all, li,
                                                        block_table)
                attn = pk.paged_attention(q, kc_all, vc_all, block_table,
                                          pos0, k_scale_rows=kr,
                                          v_scale_rows=vr, layer=li,
                                          cur_k=cur_k, cur_v=cur_v,
                                          cur_ks=cur_ks, cur_vs=cur_vs,
                                          win_k=wk, win_v=wv, win_ks=wks,
                                          win_vs=wvs, win_count=win_count,
                                          interpret=cfg.paged_kernel == 2)
            else:
                srows = {}
                if quant and scale_rows is not None:
                    srows = {"k_scale_rows": jax.lax.dynamic_index_in_dim(
                                 scale_rows[0], li, 0, keepdims=False),
                             "v_scale_rows": jax.lax.dynamic_index_in_dim(
                                 scale_rows[1], li, 0, keepdims=False)}
                attn = ops.paged_attention_stacked(
                    q, kc_all, vc_all, li, block_table, pos0,
                    precision=cfg.precision, k_scale_pool=ks_all,
                    v_scale_pool=vs_all, cur_k=cur_k, cur_v=cur_v,
                    cur_ks=cur_ks, cur_vs=cur_vs, win_k=wk, win_v=wv,
                    win_ks=wks, win_vs=wvs, win_count=win_count, **srows)
        else:
            ck = jax.lax.dynamic_index_in_dim(kc_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(vc_all, li, 0, keepdims=False)
            ksl = vsl = None
            if quant:
                ksl = jax.lax.dynamic_index_in_dim(ks_all, li, 0,
                                                   keepdims=False)
                vsl = jax.lax.dynamic_index_in_dim(vs_all, li, 0,
                                                   keepdims=False)
            attn = ops.ragged_cache_attention(q, ck, cv, pos0,
                                              precision=cfg.precision,
                                              k_scale=ksl, v_scale=vsl,
                                              cur_k=cur_k, cur_v=cur_v,
                                              cur_ks=cur_ks, cur_vs=cur_vs,
                                              win_k=wk, win_v=wv,
                                              win_ks=wks, win_vs=wvs,
                                              win_count=win_count)
        h = h + ops.fused_o_proj(attn, lp["wo"], precision=cfg.precision,
                                 scale=lp.get("wo_scale"),
                                 lora=lora_cb).astype(h.dtype)
        z = ops.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        if cfg.fused:
            h = h + ops.fused_ffn(z, lp["wgu"], lp["w_down"],
                                  precision=cfg.precision,
                                  scale_gu=lp.get("wgu_scale"),
                                  scale_down=lp.get("w_down_scale"))
        else:
            h = h + ops.swiglu(z, lp["w_gate"], lp["w_up"], lp["w_down"],
                               precision=cfg.precision,
                               s_gate=lp.get("w_gate_scale"),
                               s_up=lp.get("w_up_scale"),
                               s_down=lp.get("w_down_scale"),
                               lora=lora_cb)
        if quant:
            return h, (cur_k, cur_v, cur_ks, cur_vs)
        return h, (cur_k, cur_v)

    h, ys = jax.lax.scan(step, h, (jnp.arange(NL), params["layers"]),
                         unroll=cfg.unroll)
    if not commit:
        h = ops.rms_norm(h[:, -1, :], params["norm"], cfg.norm_eps)
        return lm_logits(params, h, cfg.precision), ys
    if block_table is not None:
        cache_new = ops.commit_decode_rows_paged(cache, ys[0], ys[1],
                                                 page_ids, offsets,
                                                 *(ys[2:] if quant else ()),
                                                 sharded=cfg.sharded)
    else:
        cache_new = ops.commit_decode_rows_dense(cache, ys[0], ys[1], pos,
                                                 *(ys[2:] if quant else ()),
                                                 sharded=cfg.sharded)
    h = ops.rms_norm(h[:, -1, :], params["norm"], cfg.norm_eps)
    return lm_logits(params, h, cfg.precision), cache_new


def fold_row_keys(base_key, rids, ctrs):
    """Per-row PRNG keys [B]: fold_in(fold_in(base, request_id), token_index).

    A request's stream is a pure function of (engine seed, request_id,
    token index) — independent of co-tenants, admission timing, and decode
    quantum size."""
    def one(rid, ctr):
        return jax.random.fold_in(jax.random.fold_in(base_key, rid), ctr)
    return jax.vmap(one)(rids, ctrs)


def sample_rows(logits, keys, temps, top_k: int = 0, top_p: float = 1.0):
    """Per-row sampling for batched serving: logits [B, VS] f32, temps [B]
    (0 = greedy for that row), keys [B] per-row PRNG keys (fold_row_keys).
    top_k/top_p are engine-wide static knobs."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    if top_k:
        kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs
        cutoff_idx = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1,
                             keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    drawn = jax.vmap(
        lambda k, row: jax.random.categorical(k, row)
    )(keys, scaled).astype(jnp.int32)
    return jnp.where(temps > 0, drawn, greedy)


def token_logprobs(logits, chosen, k: int):
    """Serving log-probabilities: log_softmax over the raw (untempered)
    logits — the model's own distribution, OpenAI-API semantics — evaluated
    at the chosen token, plus the top-k alternatives.

    logits [B, VS], chosen [B] int32, k >= 1 (top-1 is effectively free next
    to the log_softmax over the vocab).  Returns
    (chosen_lp [B] f32, top_ids [B, k] int32, top_lps [B, k] f32).
    """
    lps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen_lp = jnp.take_along_axis(
        lps, chosen[:, None].astype(jnp.int32), axis=-1)[:, 0]
    top_lps, top_ids = jax.lax.top_k(lps, k)
    return chosen_lp, top_ids.astype(jnp.int32), top_lps


def init_decode_window(cache: Dict, B: int, num_steps: int) -> Dict:
    """Zero in-flight K/V window for a deferred-commit quantum scan:
    {"k"/"v": [NL, B, KVH, Q, HD]} in the pool dtype (+ "k_s"/"v_s"
    [NL, B, KVH, Q] for int8 caches).  ~MBs even at full-8B serving shapes,
    vs the GB-scale pool a cache-carrying scan would double-buffer."""
    k = cache["k"]
    NL, KVH, HD = k.shape[0], k.shape[2], k.shape[-1]
    win = {"k": jnp.zeros((NL, B, KVH, num_steps, HD), k.dtype),
           "v": jnp.zeros((NL, B, KVH, num_steps, HD), cache["v"].dtype)}
    if "k_s" in cache:
        win["k_s"] = jnp.zeros((NL, B, KVH, num_steps), cache["k_s"].dtype)
        win["v_s"] = jnp.zeros((NL, B, KVH, num_steps), cache["v_s"].dtype)
    return win


def insert_window_rows(win: Dict, rows, s) -> Dict:
    """Write one decode step's new K/V rows (forward_ragged_decode
    commit=False output: (k, v[, k_s, v_s]) each [NL, B, KVH, ...]) into
    window column `s` (traced scalar)."""
    new = {"k": jax.lax.dynamic_update_slice_in_dim(
               win["k"], rows[0][:, :, :, None, :], s, axis=3),
           "v": jax.lax.dynamic_update_slice_in_dim(
               win["v"], rows[1][:, :, :, None, :], s, axis=3)}
    if len(rows) > 2:
        new["k_s"] = jax.lax.dynamic_update_slice_in_dim(
            win["k_s"], rows[2][:, :, :, None], s, axis=3)
        new["v_s"] = jax.lax.dynamic_update_slice_in_dim(
            win["v_s"], rows[3][:, :, :, None], s, axis=3)
    return new


def commit_window(cache: Dict, win: Dict, pos0, block_table,
                  num_steps: int, sharded: bool = False) -> Dict:
    if block_table is not None:
        return ops.commit_window_paged(cache, win, pos0, block_table,
                                       num_steps, sharded=sharded)
    return ops.commit_window_dense(cache, win, pos0, num_steps,
                                   sharded=sharded)


def _hoist_scale_rows(cache: Dict, block_table):
    """Pre-gather all layers' int8 pool scales for a quantum scan (the pool
    is frozen for the whole quantum) — one [NL, B, KVH, maxp*page] gather per
    dispatch instead of quantum x NL re-gathers inside the scan."""
    if block_table is None or "k_s" not in cache:
        return None
    return (ops.gather_page_scales_all(cache["k_s"], block_table),
            ops.gather_page_scales_all(cache["v_s"], block_table))


def ragged_decode_steps(params: Dict, tokens, pos, cache: Dict, cos, sin,
                        cfg: StaticConfig, num_steps: int, block_table=None,
                        num_logprobs: Optional[int] = None,
                        lora=None, adapter_ids=None):
    """`num_steps` ragged decode steps as one lax.scan (the serving decode
    quantum — amortizes per-dispatch latency across tokens).

    Deferred commit (round 4): the cache/pool is a loop-INVARIANT closure
    input, not a scan carry — each step attends the frozen pool (tokens
    < pos[b]) plus a tiny in-flight window holding the quantum's own rows,
    and one post-scan scatter commits the whole window.  Carrying the
    donated pool through the scan made XLA double-buffer pool-sized copies
    every step (2.7 GB/step at full-8B serving shapes, BENCHMARKS.md
    round 4).

    Returns (tokens [B, num_steps], cache); with num_logprobs=k set,
    (tokens, (chosen_lp [B, n], top_ids [B, n, k], top_lps [B, n, k]),
    cache).  Paged mode requires the block tables to already cover
    positions pos .. pos + num_steps - 1.
    """
    pos0 = pos
    scale_rows = _hoist_scale_rows(cache, block_table)
    lora_rows = (gather_lora_rows(lora["layers"], adapter_ids)
                 if lora is not None else None)

    def step(carry, s):
        tok, win = carry
        logits, rows = forward_ragged_decode(
            params, tok, pos0 + s, cache, cos, sin, cfg, block_table,
            pos0=pos0, win=win, win_count=s, commit=False,
            scale_rows=scale_rows, lora=lora, lora_rows=lora_rows)
        win = insert_window_rows(win, rows, s)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if num_logprobs is None:
            return (nxt, win), nxt
        return (nxt, win), (nxt, *token_logprobs(logits, nxt, num_logprobs))

    win0 = init_decode_window(cache, tokens.shape[0], num_steps)
    (_, win), ys = jax.lax.scan(
        step, (tokens, win0), jnp.arange(num_steps, dtype=pos.dtype))
    cache = commit_window(cache, win, pos0, block_table, num_steps,
                          sharded=cfg.sharded)
    if num_logprobs is None:
        return ys.T, cache
    toks, lp, tids, tlps = ys
    return toks.T, (lp.T, tids.transpose(1, 0, 2), tlps.transpose(1, 0, 2)), \
        cache


def sampled_ragged_decode_steps(params: Dict, tokens, pos, cache: Dict,
                                cos, sin, base_key, rids, ctrs, temps,
                                cfg: StaticConfig, num_steps: int,
                                top_k: int = 0, top_p: float = 1.0,
                                block_table=None,
                                num_logprobs: Optional[int] = None,
                                lora=None, adapter_ids=None):
    """`ragged_decode_steps` with per-row sampling (temps[b] == 0 keeps that
    row greedy), for serving engines with mixed-policy batches.

    rids/ctrs: [B] int32 request ids and per-request token indices — step i
    samples row b with fold_row_keys(base_key, rids[b], ctrs[b] + i), so
    streams are schedule-independent (ADVICE r1 #1).  num_logprobs as in
    ragged_decode_steps (logprobs of the *sampled* token under the raw
    distribution).  Deferred-commit like ragged_decode_steps."""
    pos0 = pos
    scale_rows = _hoist_scale_rows(cache, block_table)
    lora_rows = (gather_lora_rows(lora["layers"], adapter_ids)
                 if lora is not None else None)

    def step(carry, s):
        tok, win = carry
        logits, rows = forward_ragged_decode(
            params, tok, pos0 + s, cache, cos, sin, cfg, block_table,
            pos0=pos0, win=win, win_count=s, commit=False,
            scale_rows=scale_rows, lora=lora, lora_rows=lora_rows)
        win = insert_window_rows(win, rows, s)
        keys = fold_row_keys(base_key, rids, ctrs + s)
        nxt = sample_rows(logits, keys, temps, top_k, top_p)
        if num_logprobs is None:
            return (nxt, win), nxt
        return (nxt, win), (nxt, *token_logprobs(logits, nxt, num_logprobs))

    win0 = init_decode_window(cache, tokens.shape[0], num_steps)
    (_, win), ys = jax.lax.scan(
        step, (tokens, win0), jnp.arange(num_steps, dtype=pos.dtype))
    cache = commit_window(cache, win, pos0, block_table, num_steps,
                          sharded=cfg.sharded)
    if num_logprobs is None:
        return ys.T, cache
    toks, lp, tids, tlps = ys
    return toks.T, (lp.T, tids.transpose(1, 0, 2), tlps.transpose(1, 0, 2)), \
        cache


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class Llama:
    """Stateful engine over the functional core (reference-compatible API)."""

    def __init__(self, model_source: Union[str, Dict], args: ModelArgs,
                 mesh=None, precision: Optional[str] = None):
        self.args = args.validate()
        if isinstance(model_source, str):
            weights = load_parameters(model_source)
        else:
            weights = model_source
        params = build_param_tree(weights, args)
        prec = {None: None, "default": None,
                "highest": jax.lax.Precision.HIGHEST}[precision]
        unroll = args.layer_unroll
        if unroll is None:
            unroll = args.n_layers if args.n_layers <= 16 else 1
        rope_split = getattr(args, "rope_split_layout", True)
        if rope_split:
            from ..checkpoint import permute_rope_layout
            params = permute_rope_layout(params, args)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_params, shard_cache
            if args.quant in ("int8", "int4"):
                # Quantize the SPLIT tree (the TP layout keeps split
                # weights); scale leaves shard with their weights
                # (parallel.sharding.param_pspecs quant specs).
                from ..checkpoint import quantize_param_tree
                params = quantize_param_tree(
                    params, bits=4 if args.quant == "int4" else 8)
            # Pallas kernels (incl. flash prefill) are single-chip programs —
            # GSPMD cannot partition a pallas_call over TP-sharded operands,
            # so sharded engines keep the pure-XLA paths.
            self.cfg = StaticConfig.from_args(args, prec, fused=False,
                                              unroll=unroll,
                                              rope_split=rope_split
                                              )._replace(flash_prefill=False,
                                                         paged_kernel=0,
                                                         sharded=True)
            self.params = shard_params(params, mesh, args)
            self._shard_cache = lambda c: shard_cache(c, mesh)
        else:
            fused = args.fuse_matmuls
            stream = ()
            if args.quant == "int4" and fused:
                raise ValueError(
                    "quant='int4' runs the unfused split layout (the fused "
                    "Pallas decode kernels consume int8 blocks only); set "
                    "fuse_matmuls=False")
            if args.quant in ("int8", "int4") and not fused:
                from ..checkpoint import quantize_param_tree
                params = quantize_param_tree(
                    params, bits=4 if args.quant == "int4" else 8)
            if fused:
                from ..checkpoint import fuse_param_tree, quantize_param_tree
                from ..ops.kernels.decode_step import (plan_layout,
                                                       plan_streamed)
                if args.pallas_stream is not None:
                    stream = tuple(args.pallas_stream)
                    plan = (True, stream[3])
                elif args.pallas_ffn_block is not None:
                    plan = (bool(args.pallas_attn_group), args.pallas_ffn_block)
                else:
                    # int8: of the kernel layouts only the streamed one
                    # consumes scale blocks, so quantized models go straight
                    # to plan_streamed (XLA scan otherwise).
                    plan = None if args.quant else plan_layout(args)
                    if plan is None:
                        stream = tuple(plan_streamed(args) or ())
                        plan = (True, stream[3]) if stream else (False, 0)
                attn_group, fb = plan
                params = fuse_param_tree(
                    params, fb, attn_group=attn_group,
                    n_heads=args.n_heads, kv_heads=args.kv_heads,
                    head_dim=args.head_dim,
                )
                if args.quant == "int8":
                    params = quantize_param_tree(params)
            self.cfg = StaticConfig.from_args(
                args, prec, fused=fused, unroll=unroll,
                rope_split=rope_split)._replace(stream_plan=stream)
            self.params = _device_put_params(params)
            self._shard_cache = lambda c: c
        self._finish_init()

    def _finish_init(self):
        args = self.args
        cos, sin = ops.rope_tables(args.head_dim, args.max_seq_len,
                                   args.rope_theta, jnp.float32,
                                   scaling=args.rope_scaling)
        self.cos, self.sin = cos, sin
        self.cache = self.init_cache()
        self._fwd_cache: Dict[Tuple[int, bool], Any] = {}
        self._gen = None  # built lazily by generate paths
        self._last_pos = None     # position of the last generated token
        self._last_tokens = None  # [B] last generated token per row

    @classmethod
    def from_quantized(cls, path: str, args: ModelArgs, mesh=None,
                       precision: Optional[str] = None) -> "Llama":
        """Boot from a `checkpoint.save_quantized_npz` checkpoint: the int8
        split tree loads as-is (no fp32 staging, no re-quantization, ~4x
        less disk/IO than the fp32 .npz) and runs the unfused XLA paths —
        single-chip or tensor-parallel when `mesh` is given."""
        from ..checkpoint import load_quantized_npz

        params, rope_split = load_quantized_npz(path)
        self = cls.__new__(cls)
        self.args = args.validate()
        prec = {None: None, "default": None,
                "highest": jax.lax.Precision.HIGHEST}[precision]
        unroll = args.layer_unroll
        if unroll is None:
            unroll = args.n_layers if args.n_layers <= 16 else 1
        self.cfg = StaticConfig.from_args(args, prec, fused=False,
                                          unroll=unroll,
                                          rope_split=rope_split)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_params, shard_cache
            self.cfg = self.cfg._replace(flash_prefill=False, paged_kernel=0,
                                         sharded=True)
            self.params = shard_params(params, mesh, args)
            self._shard_cache = lambda c: shard_cache(c, mesh)
        else:
            self.params = _device_put_params(params)
            self._shard_cache = lambda c: c
        self._finish_init()
        return self

    @classmethod
    def from_sharded_checkpoint(cls, model_path: str, args: ModelArgs, mesh,
                                precision: Optional[str] = None) -> "Llama":
        """Build an engine by streaming a reference-schema .npz straight onto
        the mesh — each device shard is read from the (lazy) file on demand,
        so host memory peaks at one weight, not the whole checkpoint.  The
        70B-class load path (SURVEY §7 hard-part 4)."""
        from ..parallel.sharding import load_param_tree_sharded, shard_cache

        self = cls.__new__(cls)
        self.args = args.validate()
        prec = {None: None, "default": None,
                "highest": jax.lax.Precision.HIGHEST}[precision]
        unroll = args.layer_unroll
        if unroll is None:
            unroll = args.n_layers if args.n_layers <= 16 else 1
        # Streaming load skips the host-side rope permutation and matmul
        # fusion (both are single-chip decode optimizations).
        self.cfg = StaticConfig.from_args(args, prec, fused=False,
                                          unroll=unroll, rope_split=False
                                          )._replace(flash_prefill=False,
                                                     paged_kernel=0,
                                                     sharded=True)
        self.mesh = mesh
        self.params = load_param_tree_sharded(model_path, args, mesh)
        self._shard_cache = lambda c: shard_cache(c, mesh)
        self._finish_init()
        return self

    # -- cache --------------------------------------------------------------

    def init_cache(self, batch_size: Optional[int] = None) -> Dict:
        return self._shard_cache(init_cache(self.args, batch_size))

    def reset(self):
        self.cache = self.init_cache()

    # -- reference-compatible forward --------------------------------------

    def _fwd(self, L: int, first_chunk: bool):
        key = (L, first_chunk)
        if key not in self._fwd_cache:
            self._fwd_cache[key] = jax.jit(
                partial(forward, cfg=self.cfg, first_chunk=first_chunk)
            )
        return self._fwd_cache[key]

    def __call__(self, input_ids, start_pos: int) -> np.ndarray:
        """Reference API: logits [B, 1, VS] for the last position, updating
        the engine's persistent KV cache (reference llama3.py:285-308)."""
        ids = jnp.asarray(np.asarray(input_ids), jnp.int32)
        first = start_pos == 0 and ids.shape[1] > 1
        fwd = self._fwd(ids.shape[1], first)
        logits, self.cache = fwd(self.params, ids, jnp.int32(start_pos),
                                 self.cache, self.cos, self.sin)
        return np.asarray(logits)

    # -- generation ---------------------------------------------------------

    def generate(self, input_ids, max_new_tokens: int):
        """Greedy generator yielding [B, 1] int arrays, one per token.

        API- and count-compatible with reference llama3.py:310-321 —
        `max_new_tokens` bounds the *total* length, so this yields
        `max_new_tokens - L` tokens (quirk Q2) — but computed as a fused
        on-device prefill + lax.scan decode; tokens stream from a single host
        transfer.  Cache positions are contiguous (quirk Q1 resolved, the
        llama3_simple semantics)."""
        ids = np.asarray(input_ids)
        L = ids.shape[1]
        steps = min(max(max_new_tokens - L, 0), self.args.max_seq_len - L)
        toks = self.generate_tokens(ids, steps)
        for t in np.asarray(toks).T:  # [steps, B] -> per-step [B]
            yield t[:, None]

    # -- generation-state checkpointing -------------------------------------

    def save_generation_state(self, path: str):
        """Persist (KV cache, last position, last tokens) so a generation can
        be resumed deterministically in a later process (the reference has no
        such path — SURVEY §5 checkpoint/resume).  Uses the state tracked by
        the last `generate_tokens` call."""
        if self._last_tokens is None:
            raise ValueError("no generation to save; call generate_tokens first")
        np.savez(path,
                 cache_k=np.asarray(self.cache["k"]),
                 cache_v=np.asarray(self.cache["v"]),
                 pos=np.int32(self._last_pos),
                 last_tokens=np.asarray(self._last_tokens, np.int32))

    def resume_generate(self, path: str, num_tokens: int) -> jax.Array:
        """Continue greedy decoding from a saved generation state; returns
        the new tokens [B, num_tokens].  The saved `pos` is the position of
        the last generated token — resuming forwards that token at `pos`
        (writing its K/V) and continues the stream exactly."""
        from ..generate import Generator
        state = np.load(path)
        pos = int(state["pos"])
        if pos + 1 + num_tokens > self.args.max_seq_len:
            raise ValueError("resume would exceed max_seq_len")
        self.cache = self._shard_cache({
            "k": jnp.asarray(state["cache_k"]),
            "v": jnp.asarray(state["cache_v"]),
        })
        if self._gen is None:
            self._gen = Generator(self)
        tok = jnp.asarray(state["last_tokens"], jnp.int32)
        toks, self.cache = self._gen.decode_fn(num_tokens, tok.shape[0])(
            self.params, tok, jnp.int32(pos), self.cache, self.cos, self.sin
        )
        self._last_pos = pos + num_tokens
        self._last_tokens = np.asarray(toks)[:, -1]
        return toks

    def generate_tokens(self, input_ids, num_tokens: int,
                        sampling=None) -> jax.Array:
        """Fused decode of exactly `num_tokens` new tokens; returns them as
        [B, num_tokens] on device.  Greedy by default; pass a
        `generate.Sampling` policy for temperature / top-k / top-p."""
        from ..generate import Generator
        if self._gen is None:
            self._gen = Generator(self)
        ids = np.asarray(input_ids)
        toks, self.cache = self._gen.generate(
            self.params, ids, self.init_cache(ids.shape[0]), num_tokens,
            sampling=sampling,
        )
        if num_tokens > 0:
            self._last_pos = ids.shape[1] + num_tokens - 1
            self._last_tokens = np.asarray(toks)[:, -1]
        return toks
