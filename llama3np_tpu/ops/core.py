"""Core jittable ops: RMSNorm, SiLU/SwiGLU, RoPE, masked KV-cache attention.

These are the XLA-path implementations — pure `jnp` functions that XLA fuses
onto the VPU/MXU.  They mirror the math of the reference ops (reference
llama3.py:22-114 and the attention body at llama3.py:155-213) but are written
for the TPU compilation model: static shapes everywhere, masks built with
`broadcasted_iota` instead of data-dependent slicing, f32 accumulation under
low-precision params, and GQA expressed as a grouped einsum rather than
`np.repeat` (no materialized head copies).

Fused Pallas variants live in `llama3np_tpu.ops.kernels`; the functions here
are the always-available fallback and the numerics oracle for those kernels.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * w, accumulated in f32."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * w


def swiglu(x: jax.Array, w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array,
           precision=None, s_gate=None, s_up=None, s_down=None,
           lora=None) -> jax.Array:
    """SwiGLU FFN: down( silu(x@gate) * (x@up) ).  int8 weights dequantize
    via the per-output-channel scale post-multiplies (gate's before the
    SiLU nonlinearity).

    `lora`: optional callback (target_name, input) -> f32 delta or None —
    low-rank serving adapters inject AFTER dequantization, BEFORE the
    nonlinearity (multi-LoRA serving, models/llama.py)."""
    gate = jnp.dot(x, w_gate, precision=precision,
                   preferred_element_type=jnp.float32)
    up = jnp.dot(x, w_up, precision=precision,
                 preferred_element_type=jnp.float32)
    if s_gate is not None:
        gate = gate * s_gate
    if s_up is not None:
        up = up * s_up
    if lora is not None:
        dg = lora("w_gate", x)
        if dg is not None:
            gate = gate + dg
        du = lora("w_up", x)
        if du is not None:
            up = up + du
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jnp.dot(h, w_down, precision=precision,
                  preferred_element_type=jnp.float32)
    if s_down is not None:
        out = out * s_down
    if lora is not None:
        dd = lora("w_down", h)
        if dd is not None:
            out = out + dd
    return out.astype(x.dtype)


def fused_qkv(x: jax.Array, wqkv: jax.Array, n_heads: int, kv_heads: int,
              head_dim: int, precision=None, scale=None):
    """QKV projection on the fused layout; returns (q, k, v) as
    [B, L, NH, HD] / [B, L, KVH, HD].

    Standard: wqkv [D, QD+2*KVD].
    KV-head-grouped (checkpoint.fuse_param_tree attn_group): wqkv
    [KVH, D, (G+2)*HD] — group j holds its G query heads' columns, then
    k_j, then v_j.
    int8 weights (checkpoint.quantize_param_tree): pass the per-output
    `scale` ([1, F] / [KVH, 1, F]) — it commutes with the matmul, so
    dequantization is a post-scale on the projection output.
    """
    B, L, _ = x.shape
    g = n_heads // kv_heads
    if wqkv.ndim == 2:
        qd = n_heads * head_dim
        kvd = kv_heads * head_dim
        qkv = jnp.dot(x, wqkv, precision=precision,
                      preferred_element_type=jnp.float32)
        if scale is not None:
            qkv = qkv * scale
        qkv = qkv.astype(x.dtype)
        q = qkv[..., :qd].reshape(B, L, n_heads, head_dim)
        k = qkv[..., qd : qd + kvd].reshape(B, L, kv_heads, head_dim)
        v = qkv[..., qd + kvd :].reshape(B, L, kv_heads, head_dim)
        return q, k, v
    gqkv = jnp.einsum("bld,kdf->blkf", x, wqkv, precision=precision,
                      preferred_element_type=jnp.float32)
    if scale is not None:
        gqkv = gqkv * scale[:, 0]          # [KVH, 1, F] -> [KVH, F]
    gqkv = gqkv.astype(x.dtype)
    gw = g * head_dim
    q = gqkv[..., :gw].reshape(B, L, n_heads, head_dim)
    k = gqkv[..., gw : gw + head_dim]
    v = gqkv[..., gw + head_dim :]
    return q, k, v


def fused_o_proj(attn: jax.Array, wo: jax.Array, precision=None,
                 scale=None, lora=None) -> jax.Array:
    """Output projection: attn [B, L, NH, HD] with wo [QD, D] (standard) or
    [KVH, G*HD, D] (grouped rows).  Returns [B, L, D].  int8 wo dequantizes
    via the per-output `scale` post-multiply ([1, D] / [KVH, 1, D]; grouped
    scales are per-(group, column), summed over groups after scaling).
    `lora`: optional ("wo", input) -> delta callback (split layout only)."""
    B, L = attn.shape[:2]
    if wo.ndim == 2:
        flat = attn.reshape(B, L, -1)
        out = jnp.dot(flat, wo, precision=precision,
                      preferred_element_type=jnp.float32)
        if scale is not None:
            out = out * scale
        if lora is not None:
            d = lora("wo", flat)
            if d is not None:
                out = out + d
        return out
    kvh, gw, d = wo.shape
    ag = attn.reshape(B, L, kvh, gw)
    if scale is not None:
        out = jnp.einsum("blkf,kfd->blkd", ag, wo, precision=precision,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out * scale[:, 0], axis=2)
    return jnp.einsum("blkf,kfd->bld", ag, wo, precision=precision,
                      preferred_element_type=jnp.float32)


def fused_ffn(z: jax.Array, wgu: jax.Array, w_down: jax.Array,
              precision=None, scale_gu=None, scale_down=None) -> jax.Array:
    """SwiGLU on the fused gate|up layout.

    Standard: wgu [D, 2F], w_down [F, D].
    Blocked (checkpoint.fuse_param_tree ffn_block): wgu [NB, D, 2f],
    w_down [NB, f, D] — same math, summed over column blocks.
    int8 weights dequantize via per-output scale post-multiplies —
    `scale_gu` applies BEFORE the SiLU nonlinearity (it is not linear),
    `scale_down` after the down-projection (per block, before the block
    sum).
    """
    if wgu.ndim == 2:
        fd = w_down.shape[0]
        gu = jnp.dot(z, wgu, precision=precision,
                     preferred_element_type=jnp.float32)
        if scale_gu is not None:
            gu = gu * scale_gu
        ff = (jax.nn.silu(gu[..., :fd]) * gu[..., fd:]).astype(z.dtype)
        out = jnp.dot(ff, w_down, precision=precision,
                      preferred_element_type=jnp.float32)
        if scale_down is not None:
            out = out * scale_down
        return out.astype(z.dtype)
    f = w_down.shape[1]
    gu = jnp.einsum("bld,ndf->nblf", z, wgu, precision=precision,
                    preferred_element_type=jnp.float32)
    if scale_gu is not None:
        gu = gu * scale_gu[:, None]        # [NB, 1, 2f] -> [NB, 1, 1, 2f]
    ff = (jax.nn.silu(gu[..., :f]) * gu[..., f:]).astype(z.dtype)
    if scale_down is not None:
        out = jnp.einsum("nblf,nfd->nbld", ff, w_down, precision=precision,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out * scale_down[:, None], axis=0).astype(z.dtype)
    return jnp.einsum("nblf,nfd->bld", ff, w_down, precision=precision,
                      preferred_element_type=jnp.float32).astype(z.dtype)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def scale_rope_inv_freq(inv_freq: np.ndarray, scaling: dict) -> np.ndarray:
    """Llama-3.1 frequency remap (HF `rope_type: "llama3"` semantics).

    Wavelengths short relative to the original context keep their frequency,
    long wavelengths are slowed by `factor`, and a band between
    `high_freq_factor` and `low_freq_factor` interpolates smoothly — the
    published llama3.1/3.2 long-context scaling rule.  Pure NumPy f64 so the
    remap is a host-side one-time cost like the tables themselves.
    """
    factor = float(scaling["factor"])
    low = float(scaling.get("low_freq_factor", 1.0))
    high = float(scaling.get("high_freq_factor", 4.0))
    orig = float(scaling.get("original_max_position_embeddings", 8192))
    wavelen = 2.0 * np.pi / inv_freq
    smooth = (orig / wavelen - low) / (high - low)
    smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    out = np.where(wavelen > orig / low, inv_freq / factor, inv_freq)
    medium = (wavelen >= orig / high) & (wavelen <= orig / low)
    return np.where(medium, smoothed, out)


def rope_tables(head_dim: int, max_seq_len: int, theta: float = 10000.0,
                dtype=jnp.float32,
                scaling: Optional[dict] = None) -> Tuple[jax.Array, jax.Array]:
    """Precomputed cos/sin tables [M, HD//2].

    Computed host-side in f64 then cast — one-time cost, and more accurate
    than f32 accumulation of position*inv_freq at large positions.
    `scaling` (ModelArgs.rope_scaling) applies the llama3.1 frequency remap.
    """
    exponents = np.arange(0, head_dim, 2, dtype=np.float64)[: head_dim // 2] / head_dim
    inv_freq = 1.0 / (theta ** exponents)
    if scaling is not None:
        inv_freq = scale_rope_inv_freq(inv_freq, scaling)
    angles = np.arange(max_seq_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    return jnp.asarray(np.cos(angles), dtype), jnp.asarray(np.sin(angles), dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) pairs of the last axis.

    x: [B, L, H, HD]; cos/sin: [L, HD//2].  Pairing matches the reference's
    complex-as-real layout (reference llama3.py:48-76).
    """
    shape = x.shape
    xp = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    xr, xi = xp[..., 0], xp[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)
    return out.reshape(shape).astype(x.dtype)


def apply_rope_split(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """RoPE in split-halves layout: pairs are (x[..., :HD/2], x[..., HD/2:]).

    Equivalent to `apply_rope` on inputs whose head columns were permuted by
    `rope_split_permutation` — attention scores are invariant because Q and K
    are permuted consistently.  TPU-friendly: contiguous half-slices instead
    of stride-2 interleaving (no relayout on the 128-lane axis).
    """
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.astype(x.dtype)


def rope_split_permutation(n_heads: int, head_dim: int) -> np.ndarray:
    """Column permutation taking interleaved RoPE layout to split-halves.

    perm[new_index] = old_index over the flat [n_heads * head_dim] axis:
    within each head, new column j < HD/2 reads old column 2j (the "real"
    lane) and j >= HD/2 reads old column 2(j - HD/2) + 1 (the "imag" lane).
    Apply to the output columns of wq/wk once at load time.
    """
    half = head_dim // 2
    within = np.concatenate([np.arange(half) * 2, np.arange(half) * 2 + 1])
    return (np.arange(n_heads)[:, None] * head_dim + within[None, :]).reshape(-1)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def causal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     precision=None) -> jax.Array:
    """Self-attention within one block (first prefill chunk, start_pos == 0).

    q: [B, L, NH, HD]; k, v: [B, L, KVH, HD].  Returns [B, L, NH, HD].
    GQA via grouped einsum — KV heads are never materially repeated.
    """
    B, L, NH, HD = q.shape
    KVH = k.shape[2]
    G = NH // KVH
    qg = q.reshape(B, L, KVH, G, HD)
    scores = jnp.einsum("blkgd,bmkd->bkglm", qg, k, precision=precision,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(HD)
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    mi = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    scores = jnp.where(mi <= li, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkglm,bmkd->blkgd", probs, v, precision=precision,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, L, NH, HD).astype(q.dtype)


def cache_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                    pos: jax.Array, precision=None) -> jax.Array:
    """Attention of q against the full static-shape KV cache, masked to the
    causally visible prefix.

    q:        [B, L, NH, HD]  (queries at absolute positions pos..pos+L-1,
                               whose K/V are already written into the cache)
    k_cache:  [B, KVH, M, HD]
    v_cache:  [B, KVH, M, HD]
    pos:      scalar int32 — absolute position of q's first token.

    Masking `kv_idx <= pos + l` (not slicing) keeps shapes static for XLA;
    slots beyond the written prefix are excluded regardless of content, which
    also deliberately avoids the reference's stale-slot quirk (SURVEY Q1).
    """
    B, L, NH, HD = q.shape
    KVH = k_cache.shape[1]
    G = NH // KVH
    M = k_cache.shape[2]
    qg = q.reshape(B, L, KVH, G, HD)
    scores = jnp.einsum("blkgd,bkmd->bkglm", qg, k_cache, precision=precision,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(HD)
    q_pos = pos + jax.lax.broadcasted_iota(jnp.int32, (L, M), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
    scores = jnp.where(kv_idx <= q_pos, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bkglm,bkmd->blkgd", probs, v_cache, precision=precision,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, L, NH, HD).astype(q.dtype)


def blockwise_causal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                               pos, kv_block: int = 512,
                               precision=None) -> jax.Array:
    """Flash-semantics causal attention: online-softmax accumulation over KV
    blocks, so peak memory is O(L * kv_block) instead of O(L * M).

    q: [B, L, NH, HD] at absolute positions pos..pos+L-1;
    k, v: [B, T, KVH, HD] — the full visible key range starting at absolute
    position 0 (e.g. current block for pos=0 prefill, or cache rows for
    chunked prefill).  T must be a multiple of kv_block (pad with masked rows).

    This is the XLA realization of the flash recipe (running max `m`, running
    normalizer `l`, rescaled accumulator) — the Pallas prefill kernel
    specializes the same math; `causal_attention` is its oracle.
    """
    B, L, NH, HD = q.shape
    T = k.shape[1]
    KVH = k.shape[2]
    G = NH // KVH
    assert T % kv_block == 0, (T, kv_block)
    nb = T // kv_block

    qg = q.reshape(B, L, KVH, G, HD)
    q_pos = pos + jax.lax.broadcasted_iota(jnp.int32, (L, kv_block), 0)

    kb = k.transpose(0, 2, 1, 3).reshape(B, KVH, nb, kv_block, HD)
    vb = v.transpose(0, 2, 1, 3).reshape(B, KVH, nb, kv_block, HD)
    kb = jnp.moveaxis(kb, 2, 0)  # [nb, B, KVH, kv_block, HD]
    vb = jnp.moveaxis(vb, 2, 0)

    def step(carry, blk):
        acc, m, l = carry
        kj, vj, j = blk
        s = jnp.einsum("blkgd,bkcd->bkglc", qg, kj, precision=precision,
                       preferred_element_type=jnp.float32) / math.sqrt(HD)
        kv_idx = j * kv_block + jax.lax.broadcasted_iota(
            jnp.int32, (L, kv_block), 1)
        s = jnp.where((kv_idx <= q_pos)[None, None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # exp(-inf - -inf) is nan; a fully-masked running max stays -inf, so
        # guard the rescale factor.
        alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m - m_new))
        p = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(s - m_new))
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bkglc,bkcd->bkgld", p.astype(vj.dtype), vj,
                        precision=precision,
                        preferred_element_type=jnp.float32)
        acc_new = acc * alpha + pv
        return (acc_new, m_new, l_new), None

    acc0 = jnp.zeros((B, KVH, G, L, HD), jnp.float32)
    m0 = jnp.full((B, KVH, G, L, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, KVH, G, L, 1), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(
        step, (acc0, m0, l0),
        (kb, vb, jnp.arange(nb, dtype=jnp.int32)),
    )
    out = acc / jnp.maximum(l, 1e-30)
    # [B, KVH, G, L, HD] -> [B, L, NH, HD]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, L, NH, HD).astype(q.dtype)


def update_kv_cache(k_cache: jax.Array, v_cache: jax.Array,
                    k: jax.Array, v: jax.Array, pos: jax.Array):
    """Write k, v [B, L, KVH, HD] into the caches at positions pos..pos+L-1.

    Returns the updated (k_cache, v_cache), both [B, KVH, M, HD].
    """
    k_t = k.transpose(0, 2, 1, 3)  # [B, KVH, L, HD]
    v_t = v.transpose(0, 2, 1, 3)
    zero = jnp.zeros((), jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_t.astype(k_cache.dtype),
                                           (zero, zero, pos, zero))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_t.astype(v_cache.dtype),
                                           (zero, zero, pos, zero))
    return k_cache, v_cache


# ---------------------------------------------------------------------------
# int8 KV quantization (serving kv_quant="int8")
# ---------------------------------------------------------------------------

def quantize_kv_rows(x: jax.Array):
    """Per-row symmetric int8 quantization over the last (head_dim) axis.

    x: [..., HD] -> (int8 [..., HD], f32 scales [...]).  The scale commutes
    with both attention contractions: scores against a quantized K row are
    (q . k8) * s (a per-column post-scale), and the V contraction folds s
    into the softmax probs (sum_m p_m * (v8_m * s_m) == sum_m (p_m s_m) v8_m)
    — the dequantized row is never materialized, mirroring the weight-int8
    rule (checkpoint.quantize_param_tree).
    """
    xf = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.where(m > 0, m / 127.0, 1.0)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Ragged (per-row position) decode — the serving path
# ---------------------------------------------------------------------------

def ragged_update_kv_cache(k_cache: jax.Array, v_cache: jax.Array,
                           k: jax.Array, v: jax.Array, pos: jax.Array):
    """Per-row single-token cache write: row b lands at its own pos[b].

    k, v: [B, 1, KVH, HD]; pos: [B] int32.  Returns updated caches
    [B, KVH, M, HD].  Rows may sit at different sequence lengths — this is
    the decode write for continuous batching.
    """
    def write(cache_row, val_row, p):
        # cache_row: [KVH, M, HD]; val_row: [KVH, 1, HD]
        return jax.lax.dynamic_update_slice(
            cache_row, val_row, (jnp.int32(0), p, jnp.int32(0))
        )

    k_t = k.transpose(0, 2, 1, 3).astype(k_cache.dtype)  # [B, KVH, 1, HD]
    v_t = v.transpose(0, 2, 1, 3).astype(v_cache.dtype)
    k_cache = jax.vmap(write)(k_cache, k_t, pos)
    v_cache = jax.vmap(write)(v_cache, v_t, pos)
    return k_cache, v_cache


def ragged_update_scales(scales: jax.Array, s: jax.Array, pos: jax.Array):
    """Scatter per-row scale values: scales [B, KVH, M] <- s [B, KVH] at
    (b, :, pos[b]) — the companion write to `ragged_update_kv_cache` for
    int8 caches."""
    def write(row, val, p):  # row [KVH, M], val [KVH]
        return jax.lax.dynamic_update_slice(row, val[:, None],
                                            (jnp.int32(0), p))
    return jax.vmap(write)(scales, s, pos)


def paged_update_kv_cache(k_pages: jax.Array, v_pages: jax.Array,
                          k: jax.Array, v: jax.Array,
                          page_ids: jax.Array, offsets: jax.Array):
    """Scatter one token's K/V per row into the page pool.

    k_pages/v_pages: [P, KVH, page_size, HD] (one layer's pool);
    k, v: [B, 1, KVH, HD]; page_ids, offsets: [B] — row b's token lands at
    (page_ids[b], :, offsets[b]).
    """
    k_pages = k_pages.at[page_ids, :, offsets].set(
        k[:, 0].astype(k_pages.dtype))
    v_pages = v_pages.at[page_ids, :, offsets].set(
        v[:, 0].astype(v_pages.dtype))
    return k_pages, v_pages


def paged_update_scales(pool: jax.Array, s: jax.Array,
                        page_ids: jax.Array, offsets: jax.Array):
    """Scatter one token's scales per row into the scale pool: pool
    [P, KVH, page] <- s [B, KVH] at (page_ids[b], :, offsets[b]) — the
    companion write to `paged_update_kv_cache` for int8 pools."""
    return pool.at[page_ids, :, offsets].set(s)


def paged_attention(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                    block_table: jax.Array, pos: jax.Array,
                    precision=None, k_scale=None, v_scale=None) -> jax.Array:
    """Decode attention over a paged cache (XLA gather realization).

    q: [B, 1, NH, HD]; pools [P, KVH, page_size, HD]; block_table
    [B, max_pages] page ids (unused entries -> null page 0); pos [B].
    int8 pools pass their scale pools k_scale/v_scale [P, KVH, page_size]
    (kvcache.init_paged_cache quant="int8").

    Gathers each row's pages into a contiguous view and applies the ragged
    mask — the always-correct fallback and the numerics oracle for the
    Pallas kernel (ops.kernels.paged_attention), which streams pages by
    block table instead of materializing the gather.
    """
    B = q.shape[0]
    maxp = block_table.shape[1]
    kvh, page, hd = k_pages.shape[1], k_pages.shape[2], k_pages.shape[3]
    kg = k_pages[block_table]  # [B, maxp, KVH, page, HD]
    vg = v_pages[block_table]
    k_t = kg.transpose(0, 2, 1, 3, 4).reshape(B, kvh, maxp * page, hd)
    v_t = vg.transpose(0, 2, 1, 3, 4).reshape(B, kvh, maxp * page, hd)
    ks = vs = None
    if k_scale is not None:
        ks = gather_page_scales(k_scale, block_table)
        vs = gather_page_scales(v_scale, block_table)
    return ragged_cache_attention(q, k_t, v_t, pos, precision=precision,
                                  k_scale=ks, v_scale=vs)


def gather_page_scales(scale_pool: jax.Array, block_table: jax.Array):
    """[P, KVH, page] scale pool -> per-row dense scales [B, KVH, maxp*page]
    following the block table.  Tiny traffic (1/HD of the value pools); also
    the form the Pallas paged kernel takes its scales in (its value DMAs
    stream pages, but per-token scales ride a regular VMEM block)."""
    B, maxp = block_table.shape
    kvh, page = scale_pool.shape[1], scale_pool.shape[2]
    g = scale_pool[block_table]  # [B, maxp, KVH, page]
    return g.transpose(0, 2, 1, 3).reshape(B, kvh, maxp * page)


def ragged_cache_attention(q: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, pos: jax.Array,
                           precision=None, k_scale=None,
                           v_scale=None, cur_k=None, cur_v=None,
                           cur_ks=None, cur_vs=None,
                           win_k=None, win_v=None, win_ks=None,
                           win_vs=None, win_count=None) -> jax.Array:
    """Single-token attention with per-row visible lengths.

    q: [B, 1, NH, HD]; caches [B, KVH, M, HD]; pos: [B] — row b attends
    kv_idx <= pos[b].  Returns [B, 1, NH, HD].

    int8 caches (kv_quant) pass k_scale/v_scale [B, KVH, M]: K scales apply
    as a per-column post-scale on the scores, V scales fold into the probs
    before the value contraction (see quantize_kv_rows) — f32 accumulation
    either way, no dequantized cache is ever materialized.

    Appended-current mode (cur_k/cur_v [B, KVH, HD] given, cache dtype):
    the cache is READ-ONLY state holding tokens 0..pos[b]-1 (mask is strict,
    kv_idx < pos) and the current token's K/V ride as an explicit appended
    column — the form that lets the serving layer scan keep the whole pool
    loop-invariant and commit all layers' new rows with one post-scan
    scatter instead of re-stacking pool-sized ys per layer.  int8 callers
    pass the quantized rows + their scales (cur_ks/cur_vs [B, KVH]) so the
    math matches a read-back of the written cache exactly.

    In-flight window mode (win_k/win_v [B, KVH, Q, HD] given, cache dtype,
    with win_count a traced scalar): the quantum scan's deferred-commit
    form — `pos` is the DISPATCH-START position (the cache holds tokens
    0..pos[b]-1 for the whole quantum), window column s holds the K/V of
    the token decoded at quantum step s (position pos[b] + s), and only
    columns s < win_count are visible.  Requires appended-current mode.
    int8 windows pass win_ks/win_vs [B, KVH, Q].
    """
    B, L, NH, HD = q.shape
    assert L == 1, "ragged attention is a decode (single-token) op"
    KVH = k_cache.shape[1]
    G = NH // KVH
    M = k_cache.shape[2]
    append = cur_k is not None
    assert win_k is None or append, "window mode requires appended-current"
    qg = q.reshape(B, KVH, G, HD)
    kc = k_cache.astype(q.dtype) if k_cache.dtype == jnp.int8 else k_cache
    scores = jnp.einsum("bkgd,bkmd->bkgm", qg, kc, precision=precision,
                        preferred_element_type=jnp.float32)
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    scores = scores / math.sqrt(HD)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, M), 3)
    lim = pos[:, None, None, None]
    nwin = 0
    if append:
        scores = jnp.where(kv_idx < lim, scores, -jnp.inf)
        parts = [scores]
        if win_k is not None:
            nwin = win_k.shape[2]
            wk = win_k.astype(q.dtype) if win_k.dtype == jnp.int8 else win_k
            s_win = jnp.einsum("bkgd,bkqd->bkgq", qg, wk,
                               precision=precision,
                               preferred_element_type=jnp.float32)
            if win_ks is not None:
                s_win = s_win * win_ks[:, :, None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, nwin), 3)
            parts.append(jnp.where(col < win_count,
                                   s_win / math.sqrt(HD), -jnp.inf))
        ck = cur_k.astype(q.dtype) if cur_k.dtype == jnp.int8 else cur_k
        s_cur = jnp.einsum("bkgd,bkd->bkg", qg, ck, precision=precision,
                           preferred_element_type=jnp.float32)
        if cur_ks is not None:
            s_cur = s_cur * cur_ks[:, :, None]
        parts.append((s_cur / math.sqrt(HD))[..., None])
        scores = jnp.concatenate(parts, axis=-1)
    else:
        scores = jnp.where(kv_idx <= lim, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    p_win = probs[..., M:M + nwin] if nwin else None
    p_cur = probs[..., M + nwin:] if append else None  # [B, KVH, G, 1]
    probs = probs[..., :M] if append else probs
    if v_scale is not None:
        probs = (probs * v_scale[:, :, None, :]).astype(q.dtype)
        vc = v_cache.astype(q.dtype)
    else:
        probs = probs.astype(v_cache.dtype)
        vc = v_cache
    out = jnp.einsum("bkgm,bkmd->bkgd", probs, vc, precision=precision,
                     preferred_element_type=jnp.float32)
    if nwin:
        wv = win_v.astype(q.dtype) if win_v.dtype == jnp.int8 else win_v
        if win_vs is not None:
            p_win = p_win * win_vs[:, :, None, :]
        # Masked columns carry probs exactly 0 (softmax of -inf), so the
        # garbage values in unwritten window columns contribute nothing.
        out = out + jnp.einsum("bkgq,bkqd->bkgd",
                               p_win.astype(q.dtype), wv,
                               precision=precision,
                               preferred_element_type=jnp.float32)
    if append:
        cv = cur_v.astype(q.dtype) if cur_v.dtype == jnp.int8 else cur_v
        if cur_vs is not None:
            p_cur = p_cur * cur_vs[:, :, None, None]
        out = out + p_cur.astype(jnp.float32) * cv.astype(
            jnp.float32)[:, :, None, :]
    return out.reshape(B, 1, NH, HD).astype(q.dtype)


def paged_attention_stacked(q: jax.Array, k_pools: jax.Array,
                            v_pools: jax.Array, li, block_table: jax.Array,
                            pos: jax.Array, precision=None,
                            k_scale_pool=None, v_scale_pool=None,
                            cur_k=None, cur_v=None,
                            cur_ks=None, cur_vs=None,
                            win_k=None, win_v=None, win_ks=None,
                            win_vs=None, win_count=None,
                            k_scale_rows=None, v_scale_rows=None) -> jax.Array:
    """XLA paged decode attention reading layer `li` of the STACKED pools.

    k_pools/v_pools: [NL, P, KVH, page, HD] — the whole-model pool stays a
    loop-invariant input of the serving layer scan; this gathers only the
    block-table pages of layer `li` (one fused gather, no pool-sized slice
    materialization) and attends with the current token appended
    (see ragged_cache_attention).  Scale pools are [NL, P, KVH, page].
    win_* pass through to the in-flight-window mode (deferred-commit
    quantum scans)."""
    B = q.shape[0]
    maxp = block_table.shape[1]
    kvh, page, hd = k_pools.shape[2], k_pools.shape[3], k_pools.shape[4]
    kg = k_pools[li, block_table]  # [B, maxp, KVH, page, HD]
    vg = v_pools[li, block_table]
    k_t = kg.transpose(0, 2, 1, 3, 4).reshape(B, kvh, maxp * page, hd)
    v_t = vg.transpose(0, 2, 1, 3, 4).reshape(B, kvh, maxp * page, hd)
    ks, vs = k_scale_rows, v_scale_rows  # pre-hoisted rows (quantum scans)
    if k_scale_pool is not None and ks is None:
        ks = gather_page_scales_stacked(k_scale_pool, li, block_table)
        vs = gather_page_scales_stacked(v_scale_pool, li, block_table)
    return ragged_cache_attention(q, k_t, v_t, pos, precision=precision,
                                  k_scale=ks, v_scale=vs, cur_k=cur_k,
                                  cur_v=cur_v, cur_ks=cur_ks, cur_vs=cur_vs,
                                  win_k=win_k, win_v=win_v, win_ks=win_ks,
                                  win_vs=win_vs, win_count=win_count)


def gather_page_scales_stacked(scale_pools: jax.Array, li,
                               block_table: jax.Array):
    """Layer `li` of stacked scale pools [NL, P, KVH, page] -> per-row dense
    scales [B, KVH, maxp*page] following the block table (the stacked-pool
    counterpart of gather_page_scales)."""
    B, maxp = block_table.shape
    kvh, page = scale_pools.shape[2], scale_pools.shape[3]
    g = scale_pools[li, block_table]  # [B, maxp, KVH, page]
    return g.transpose(0, 2, 1, 3).reshape(B, kvh, maxp * page)


def gather_page_scales_all(scale_pools: jax.Array, block_table: jax.Array):
    """ALL layers of stacked scale pools [NL, P, KVH, page] -> dense rows
    [NL, B, KVH, maxp*page] in one gather.

    The deferred-commit quantum scan's hoist: within a quantum the pool (and
    its scales) is frozen, so the per-(layer, quantum-step) re-gather that
    gather_page_scales_stacked would do inside the scan — quantum x NL
    gathers of the same bytes — collapses to this single pre-scan gather;
    the scan body then takes layer li's rows with a free dynamic slice.

    The layer axis folds into the gather index ([NL*P, ...] view) — an
    unindexed leading NL makes XLA:TPU relayout the scale pool around the
    gather (the _commit_rows_flat layout rule, gather form)."""
    nl, P, kvh, page = scale_pools.shape
    B, maxp = block_table.shape
    idx = jnp.arange(nl)[:, None, None] * P + block_table  # [NL, B, maxp]
    g = scale_pools.reshape(nl * P, kvh, page)[idx]  # [NL, B, maxp, KVH, page]
    return g.transpose(0, 1, 3, 2, 4).reshape(nl, B, kvh, maxp * page)


def _commit_rows_flat(pool: jax.Array, flat, vals, tail_ndim: int):
    """Scatter `vals` [NL, N, *tail] into `pool` [NL, *dims, *tail] at the
    per-layer flattened row indices `flat` [N] (linear over prod(dims)).

    THE layout lesson of the serving commit paths (AOT-confirmed at full-8B
    shapes): a scatter with any pool axis left as a "window" dim — advanced
    indices on separated axes (.at[:, p, :, o]) or even a leading unindexed
    NL — makes XLA:TPU relayout the whole pool around the scatter, i.e. two
    pool-sized copies (~6.6 ms each for a 2.2 GB pool) per dispatch.
    Folding every batch-like axis into ONE linear row index leaves only the
    already-minor tail as the window, the flattened view is a bitcast of
    the native layout, and the scatter updates the donated pool in place.

    Out-of-range `flat` entries must be pre-mapped to >= rows_per_layer *
    n_layers by the caller (XLA drops OOB scatter indices; an unguarded
    overflow would wrap into the next layer's rows)."""
    nl = pool.shape[0]
    tail = pool.shape[pool.ndim - tail_ndim:] if tail_ndim else ()
    rows_per_layer = math.prod(pool.shape[1:pool.ndim - tail_ndim])
    idx = (jnp.arange(nl)[:, None] * rows_per_layer
           + flat[None, :]).reshape(-1)
    return pool.reshape(nl * rows_per_layer, *tail).at[idx].set(
        vals.reshape(idx.shape[0], *tail)).reshape(pool.shape)


def commit_decode_rows_paged(cache: Dict, k_rows: jax.Array,
                             v_rows: jax.Array, page_ids: jax.Array,
                             offsets: jax.Array, ks_rows=None,
                             vs_rows=None, sharded: bool = False) -> Dict:
    """Commit every layer's new decode K/V rows to the paged pool in ONE
    scatter: rows [NL, B, KVH, HD] (pool dtype) land at
    (layer, page_ids[b], :, offsets[b]).  The single write point the
    restructured serving step uses after its layer scan — the pool input is
    donated by the caller, so this is an in-place update, not a copy
    (_commit_rows_flat keeps it layout-neutral).
    int8 pools also commit scale rows [NL, B, KVH].

    sharded=True (TP pools, KVH carries a mesh axis): keeps the multi-axis
    scatter — indices touch only replicated axes so each shard commits its
    own heads locally; the flat form's reshape would merge the sharded KVH
    axis away and force a full reshard per step."""
    if sharded:
        new = {"k": cache["k"].at[:, page_ids, :, offsets].set(
                   k_rows.astype(cache["k"].dtype).transpose(1, 0, 2, 3)),
               "v": cache["v"].at[:, page_ids, :, offsets].set(
                   v_rows.astype(cache["v"].dtype).transpose(1, 0, 2, 3))}
        if ks_rows is not None:
            new["k_s"] = cache["k_s"].at[:, page_ids, :, offsets].set(
                ks_rows.transpose(1, 0, 2))
            new["v_s"] = cache["v_s"].at[:, page_ids, :, offsets].set(
                vs_rows.transpose(1, 0, 2))
        return new
    kvh, page = cache["k"].shape[2], cache["k"].shape[3]
    flat = ((page_ids[:, None] * kvh + jnp.arange(kvh)) * page
            + offsets[:, None]).reshape(-1)          # [B*KVH]
    new = {"k": _commit_rows_flat(cache["k"],
                                  flat, k_rows.astype(cache["k"].dtype), 1),
           "v": _commit_rows_flat(cache["v"],
                                  flat, v_rows.astype(cache["v"].dtype), 1)}
    if ks_rows is not None:
        new["k_s"] = _commit_rows_flat(cache["k_s"], flat, ks_rows, 0)
        new["v_s"] = _commit_rows_flat(cache["v_s"], flat, vs_rows, 0)
    return new


def commit_window_paged(cache: Dict, win: Dict, pos0: jax.Array,
                        block_table: jax.Array, num_steps: int,
                        sharded: bool = False) -> Dict:
    """Commit a whole quantum's in-flight window to the paged pool in ONE
    scatter: win["k"/"v"] [NL, B, KVH, Q, HD] (pool dtype; int8 windows also
    carry "k_s"/"v_s" [NL, B, KVH, Q]) — column s of row b lands at the
    (page, offset) of position pos0[b] + s via the block table.

    This is the deferred-commit form of commit_decode_rows_paged: the pool
    is never a quantum-scan carry (XLA double-buffered 2.7 GB of pool copies
    per step at full-8B shapes — BENCHMARKS.md round 4), only the ~MB window
    is.  Quantum-overrun positions clamp into the row's last block-table
    entry exactly like the per-step form (duplicate-slot writes there are
    unordered, but those slots are never attended before being rewritten at
    the slot's next admission)."""
    nl, P, kvh, page, hd = cache["k"].shape
    maxp = block_table.shape[1]
    steps = pos0[:, None] + jnp.arange(num_steps, dtype=pos0.dtype)  # [B, Q]
    pidx = jnp.take_along_axis(block_table,
                               jnp.minimum(steps // page, maxp - 1), axis=1)
    offs = steps % page
    if sharded:  # TP pools: multi-axis scatter keeps KVH sharded (see
        #          commit_decode_rows_paged)
        new = {"k": cache["k"].at[:, pidx, :, offs].set(
                   win["k"].transpose(1, 3, 0, 2, 4)),
               "v": cache["v"].at[:, pidx, :, offs].set(
                   win["v"].transpose(1, 3, 0, 2, 4))}
        if "k_s" in win:
            new["k_s"] = cache["k_s"].at[:, pidx, :, offs].set(
                win["k_s"].transpose(1, 3, 0, 2))
            new["v_s"] = cache["v_s"].at[:, pidx, :, offs].set(
                win["v_s"].transpose(1, 3, 0, 2))
        return new
    # Layout-neutral flat-row scatter (see _commit_rows_flat).
    flat = ((pidx[..., None] * kvh + jnp.arange(kvh)) * page
            + offs[..., None]).reshape(-1)          # [B*Q*KVH]

    def commit(pool, rows, tail_ndim):
        # rows [NL, B, KVH, Q, *tail] -> [NL, B, Q, KVH, *tail] (flat order)
        return _commit_rows_flat(pool, flat, jnp.moveaxis(rows, 3, 2),
                                 tail_ndim)

    new = {"k": commit(cache["k"], win["k"], 1),
           "v": commit(cache["v"], win["v"], 1)}
    if "k_s" in win:
        new["k_s"] = commit(cache["k_s"], win["k_s"], 0)
        new["v_s"] = commit(cache["v_s"], win["v_s"], 0)
    return new


def commit_window_dense(cache: Dict, win: Dict, pos0: jax.Array,
                        num_steps: int, sharded: bool = False) -> Dict:
    """Dense-cache counterpart of commit_window_paged: window column s of
    row b lands at (layer, b, :, pos0[b] + s) of the [NL, B, KVH, M, HD]
    cache in one scatter (out-of-range overrun positions are dropped by the
    scatter, matching the per-step form's behavior)."""
    nl, B, kvh, M, _ = cache["k"].shape
    steps = pos0[:, None] + jnp.arange(num_steps, dtype=pos0.dtype)  # [B, Q]
    if sharded:  # TP caches: multi-axis scatter keeps B/KVH sharded
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, num_steps))
        new = {"k": cache["k"].at[:, rows, :, steps].set(
                   win["k"].transpose(1, 3, 0, 2, 4)),
               "v": cache["v"].at[:, rows, :, steps].set(
                   win["v"].transpose(1, 3, 0, 2, 4))}
        if "k_s" in win:
            new["k_s"] = cache["k_s"].at[:, rows, :, steps].set(
                win["k_s"].transpose(1, 3, 0, 2))
            new["v_s"] = cache["v_s"].at[:, rows, :, steps].set(
                win["v_s"].transpose(1, 3, 0, 2))
        return new
    # Layout-neutral flat-row scatter (see _commit_rows_flat); out-of-range
    # overrun positions map past every layer's rows so XLA drops them
    # (matching the old multi-axis scatter's OOB-drop semantics).
    flat = ((jnp.arange(B)[:, None, None] * kvh + jnp.arange(kvh)) * M
            + steps[:, :, None])                    # [B, Q, KVH]
    flat = jnp.where(steps[:, :, None] < M, flat, nl * B * kvh * M)
    flat = flat.reshape(-1)

    def commit(pool, rows, tail_ndim):
        return _commit_rows_flat(pool, flat, jnp.moveaxis(rows, 3, 2),
                                 tail_ndim)

    new = {"k": commit(cache["k"], win["k"], 1),
           "v": commit(cache["v"], win["v"], 1)}
    if "k_s" in win:
        new["k_s"] = commit(cache["k_s"], win["k_s"], 0)
        new["v_s"] = commit(cache["v_s"], win["v_s"], 0)
    return new


def commit_decode_rows_dense(cache: Dict, k_rows: jax.Array,
                             v_rows: jax.Array, pos: jax.Array,
                             ks_rows=None, vs_rows=None,
                             sharded: bool = False) -> Dict:
    """Dense-cache counterpart of commit_decode_rows_paged: rows
    [NL, B, KVH, HD] land at (layer, b, :, pos[b]) of the
    [NL, B, KVH, M, HD] cache in one layout-neutral scatter
    (_commit_rows_flat; OOB positions dropped as before)."""
    if sharded:  # TP caches: multi-axis scatter keeps B/KVH sharded
        rows = jnp.arange(pos.shape[0])
        new = {"k": cache["k"].at[:, rows, :, pos].set(
                   k_rows.astype(cache["k"].dtype).transpose(1, 0, 2, 3)),
               "v": cache["v"].at[:, rows, :, pos].set(
                   v_rows.astype(cache["v"].dtype).transpose(1, 0, 2, 3))}
        if ks_rows is not None:
            new["k_s"] = cache["k_s"].at[:, rows, :, pos].set(
                ks_rows.transpose(1, 0, 2))
            new["v_s"] = cache["v_s"].at[:, rows, :, pos].set(
                vs_rows.transpose(1, 0, 2))
        return new
    nl, B, kvh, M, _ = cache["k"].shape
    flat = ((jnp.arange(B)[:, None] * kvh + jnp.arange(kvh)) * M
            + pos[:, None])                          # [B, KVH]
    flat = jnp.where(pos[:, None] < M, flat, nl * B * kvh * M).reshape(-1)
    new = {"k": _commit_rows_flat(cache["k"], flat,
                                  k_rows.astype(cache["k"].dtype), 1),
           "v": _commit_rows_flat(cache["v"], flat,
                                  v_rows.astype(cache["v"].dtype), 1)}
    if ks_rows is not None:
        new["k_s"] = _commit_rows_flat(cache["k_s"], flat, ks_rows, 0)
        new["v_s"] = _commit_rows_flat(cache["v_s"], flat, vs_rows, 0)
    return new
