"""Pallas fused-decode-kernel parity (interpreter mode on CPU).

The XLA-path ops are the oracle: the fused kernel must reproduce the decode
stream and logits of the `decode_steps` scan within fp32 tolerance.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama

ATOL, RTOL = 1e-4, 2e-4


@pytest.mark.parametrize("name,kw", [
    ("test-tiny", {}),
    ("test-tiny-mha", {}),
    ("test-tiny", dict(pallas_ffn_block=32)),
    ("test-tiny", dict(pallas_ffn_block=32, pallas_attn_group=True)),
    # Fully streamed 8B-class layout: D-blocked QKV + M-blocked flash cache
    # attention + wo column blocks (dq, m, do, ffn blocks).
    ("test-tiny", dict(pallas_stream=(32, 32, 32, 64))),
    ("test-tiny-mha", dict(pallas_stream=(24, 16, 24, 48))),
])
def test_pallas_decode_matches_xla(name, kw, rng):
    """Full generate: Pallas fused decode (all layout variants) vs XLA
    decode, token identity."""
    args_x = preset(name, attn_impl="xla")
    args_p = preset(name, attn_impl="pallas", **kw)
    weights = synthetic_weights(args_x, seed=13)
    ids = rng.integers(3, args_x.vocab_size, size=(1, 5)).astype(np.int32)

    eng_x = Llama(weights, args_x)
    want = np.asarray(eng_x.generate_tokens(ids, 10))[0].tolist()

    eng_p = Llama(weights, args_p)
    got = np.asarray(eng_p.generate_tokens(ids, 10))[0].tolist()
    assert got == want


@pytest.mark.parametrize("L,nh,kvh,hd,bq,bk", [
    (32, 4, 2, 16, 16, 16),   # GQA, multiple blocks
    (64, 2, 2, 32, 32, 16),   # MHA, asymmetric blocks
    (16, 3, 1, 8, 16, 16),    # single block, MQA
])
def test_flash_prefill_matches_dense(rng, L, nh, kvh, hd, bq, bk):
    from llama3np_tpu.ops.core import causal_attention
    from llama3np_tpu.ops.kernels.flash_prefill import flash_prefill

    B = 2
    q = rng.standard_normal((B, L, nh, hd)).astype(np.float32)
    k = rng.standard_normal((B, L, kvh, hd)).astype(np.float32)
    v = rng.standard_normal((B, L, kvh, hd)).astype(np.float32)
    got = flash_prefill(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        q_block=bq, kv_block=bk, interpret=True)
    want = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("ffn_block,attn_group", [(0, False), (32, False),
                                                  (32, True)])
def test_pallas_layer_step_values(tiny_args, tiny_weights, rng, ffn_block,
                                  attn_group):
    """Single decode step: kernel hidden state vs the XLA layer scan.

    ffn_block=32 exercises the FFN-blocked (layers x blocks grid) variant
    (test-tiny hidden_dim=128 -> 4 column blocks); attn_group additionally
    streams attention per KV-head group (test-tiny KVH=2, G=2)."""
    from llama3np_tpu.checkpoint import (build_param_tree, fuse_param_tree,
                                         permute_rope_layout)
    from llama3np_tpu.models.llama import forward_hidden, StaticConfig
    from llama3np_tpu.ops.core import rope_tables
    from llama3np_tpu.ops.kernels.decode_step import decode_layers
    from llama3np_tpu.kvcache import init_cache

    args = tiny_args
    params = permute_rope_layout(build_param_tree(tiny_weights, args), args)
    fused = fuse_param_tree(params, ffn_block, attn_group=attn_group,
                            n_heads=args.n_heads, kv_heads=args.kv_heads,
                            head_dim=args.head_dim)
    cfg = StaticConfig.from_args(args, fused=True, rope_split=True)
    cos, sin = rope_tables(args.head_dim, args.max_seq_len, args.rope_theta)

    # Seed both paths with the same prefilled cache.
    cache = init_cache(args)
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    h, cache = forward_hidden({k: jnp.asarray(v) if not isinstance(v, dict)
                               else jax.tree.map(jnp.asarray, v)
                               for k, v in fused.items()},
                              jnp.asarray(ids), jnp.int32(0), cache,
                              cos, sin, cfg, first_chunk=True)

    pos = jnp.int32(4)
    tok = jnp.array([7], jnp.int32)
    x = jnp.take(jnp.asarray(fused["tok_embedding"]), tok, axis=0)

    # Oracle: one XLA decode forward.
    h_x, cache_x = forward_hidden(jax.tree.map(jnp.asarray, fused),
                                  tok[:, None], pos, jax.tree.map(jnp.array, cache),
                                  cos, sin, cfg, first_chunk=False)

    # Kernel (interpret mode).
    cos_row = cos[4:5]
    sin_row = sin[4:5]
    x_out, kc, vc = decode_layers(
        jax.tree.map(jnp.asarray, fused["layers"]), x, pos,
        cache["k"][:, 0], cache["v"][:, 0], cos_row, sin_row,
        n_heads=args.n_heads, kv_heads=args.kv_heads,
        head_dim=args.head_dim, norm_eps=args.norm_eps, interpret=True,
    )

    assert_allclose(np.asarray(x_out), np.asarray(h_x)[:, 0], rtol=RTOL, atol=ATOL)
    assert_allclose(np.asarray(kc), np.asarray(cache_x["k"])[:, 0], rtol=RTOL, atol=ATOL)
    assert_allclose(np.asarray(vc), np.asarray(cache_x["v"])[:, 0], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("ffn_block,attn_group,stream", [
    (0, False, ()),
    (32, True, ()),
    (32, True, (32, 16, 32, 32)),
])
def test_pallas_decode_bf16_close(tiny_args, rng, ffn_block, attn_group,
                                  stream):
    """bf16 kernels vs the bf16 XLA layer scan: numeric closeness, not token
    identity.  The kernels contract low-precision caches natively (q cast
    down, f32 accumulation, probs downcast — the same semantics as the XLA
    einsum) but round q at a slightly different point than the XLA scan, so
    argmax on random tiny weights can legitimately flip; the contract is
    hidden-state and cache-row agreement within a bf16 envelope.
    """
    from llama3np_tpu import synthetic_weights as synth
    from llama3np_tpu.checkpoint import (build_param_tree, fuse_param_tree,
                                         permute_rope_layout)
    from llama3np_tpu.models.llama import forward_hidden, StaticConfig
    from llama3np_tpu.ops.core import rope_tables
    from llama3np_tpu.ops.kernels.decode_step import decode_layers
    from llama3np_tpu.kvcache import init_cache
    import dataclasses

    args = dataclasses.replace(tiny_args, dtype="bfloat16",
                               kv_dtype="bfloat16")
    weights = synth(args, seed=13)
    params = permute_rope_layout(build_param_tree(weights, args), args)
    fused = fuse_param_tree(params, ffn_block, attn_group=attn_group,
                            n_heads=args.n_heads, kv_heads=args.kv_heads,
                            head_dim=args.head_dim)
    fused = jax.tree.map(lambda a: jnp.asarray(
        a, jnp.bfloat16 if np.asarray(a).dtype == np.float32 else None), fused)
    cfg = StaticConfig.from_args(args, fused=True, rope_split=True)
    cos, sin = rope_tables(args.head_dim, args.max_seq_len, args.rope_theta)

    cache = init_cache(args)
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    h, cache = forward_hidden(fused, jnp.asarray(ids), jnp.int32(0), cache,
                              cos, sin, cfg, first_chunk=True)

    pos = jnp.int32(4)
    tok = jnp.array([7], jnp.int32)
    x = jnp.take(fused["tok_embedding"], tok, axis=0)
    h_x, cache_x = forward_hidden(fused, tok[:, None], pos,
                                  jax.tree.map(jnp.array, cache),
                                  cos, sin, cfg, first_chunk=False)
    x_out, kc, vc = decode_layers(
        fused["layers"], x, pos, cache["k"][:, 0], cache["v"][:, 0],
        cos[4:5], sin[4:5], n_heads=args.n_heads, kv_heads=args.kv_heads,
        head_dim=args.head_dim, norm_eps=args.norm_eps, interpret=True,
        stream_plan=stream,
    )
    BF_RTOL, BF_ATOL = 5e-2, 5e-2
    assert_allclose(np.asarray(x_out, np.float32),
                    np.asarray(h_x, np.float32)[:, 0],
                    rtol=BF_RTOL, atol=BF_ATOL)
    assert_allclose(np.asarray(kc, np.float32),
                    np.asarray(cache_x["k"], np.float32)[:, 0],
                    rtol=BF_RTOL, atol=BF_ATOL)
    assert_allclose(np.asarray(vc, np.float32),
                    np.asarray(cache_x["v"], np.float32)[:, 0],
                    rtol=BF_RTOL, atol=BF_ATOL)


@pytest.mark.parametrize("d,vs,blk", [
    (288, 32000, 3584),   # stories15M shape, block divides nothing special
    (288, 32000, None),   # planner-chosen block
    (64, 1000, 384),      # vocab not a multiple of the block (masked tail)
    (128, 512, 512),      # single block
])
def test_greedy_head_matches_argmax(rng, d, vs, blk):
    """Streaming lm_head+argmax kernel vs XLA argmax(dot) — exact token
    identity, including the masked tail block."""
    from llama3np_tpu.ops.kernels.greedy_head import argmax_head

    x = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, vs)), jnp.float32)
    got = int(argmax_head(x, w, block=blk, interpret=True)[0])
    want = int(np.argmax(np.asarray(
        jnp.dot(x, w, preferred_element_type=jnp.float32))))
    assert got == want


def test_greedy_head_tie_breaks_first():
    """np.argmax tie order: the lowest index wins, across block boundaries."""
    from llama3np_tpu.ops.kernels.greedy_head import argmax_head

    x = jnp.ones((1, 4), jnp.float32)
    w = np.zeros((4, 600), np.float32)
    w[:, 7] = 2.5
    w[:, 300] = 2.5  # same max in a later block must not win
    got = int(argmax_head(x, jnp.asarray(w), block=256, interpret=True)[0])
    assert got == 7


@pytest.mark.parametrize("nh,kvh,hd,page,dt", [
    (4, 4, 16, 8, np.float32),    # MHA
    (4, 2, 32, 8, np.float32),    # GQA
    (8, 2, 16, 16, np.float32),   # wider group
    (4, 2, 32, 8, "bfloat16"),    # low-precision pool
])
def test_paged_attention_kernel_matches_gather(rng, nh, kvh, hd, page, dt):
    """Page-streaming kernel vs the XLA gather oracle: ragged per-row
    positions, shuffled block tables, null-page padding."""
    from llama3np_tpu.ops.core import paged_attention as oracle
    from llama3np_tpu.ops.kernels.paged_attention import (
        paged_attention as kernel)

    B, P, maxp = 3, 17, 4
    q = jnp.asarray(rng.standard_normal((B, 1, nh, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((P, kvh, page, hd)), dt)
    vp = jnp.asarray(rng.standard_normal((P, kvh, page, hd)), dt)
    # Shuffled, non-contiguous page ids per row; unused entries -> null page 0.
    perm = rng.permutation(np.arange(1, P))[: B * maxp].reshape(B, maxp)
    bt = np.ascontiguousarray(perm).astype(np.int32)
    pos = np.array([0, page + 3, maxp * page - 1], np.int32)  # ragged lengths
    bt[0, 1:] = 0
    bt[1, 2:] = 0

    got = kernel(q, kp, vp, jnp.asarray(bt), jnp.asarray(pos), interpret=True)
    # The kernel accumulates in f32 regardless of pool dtype (it never
    # downcasts softmax probs the way the XLA einsum path does), so the
    # reference is the oracle on the f32-upcast pool — same quantized inputs,
    # same f32 math.
    want = oracle(q, kp.astype(jnp.float32), vp.astype(jnp.float32),
                  jnp.asarray(bt), jnp.asarray(pos))
    assert_allclose(np.asarray(got), np.asarray(want), rtol=RTOL, atol=ATOL)


def test_paged_attention_kernel_clamps_overrun_pos(rng):
    """A row whose pos overran the table (retired mid-quantum, pos >=
    max_seq_len) must not index the block table out of bounds; its output is
    discarded by the caller but the kernel must still be in-bounds, and
    in-range rows must be unaffected (ADVICE r2 high)."""
    from llama3np_tpu.ops.core import paged_attention as oracle
    from llama3np_tpu.ops.kernels.paged_attention import (
        paged_attention as kernel)

    nh, kvh, hd, page = 4, 2, 32, 8
    B, P, maxp = 2, 9, 4
    q = jnp.asarray(rng.standard_normal((B, 1, nh, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((P, kvh, page, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((P, kvh, page, hd)), jnp.float32)
    bt = np.arange(1, 1 + B * maxp, dtype=np.int32).reshape(B, maxp)
    # Row 0 overran: pos = maxp*page + 5 would need page index maxp+0.x —
    # past the [B, maxp] table.  Row 1 is a normal in-range row.
    pos = np.array([maxp * page + 5, page + 2], np.int32)

    got = kernel(q, kp, vp, jnp.asarray(bt), jnp.asarray(pos), interpret=True)
    want = oracle(q, kp, vp, jnp.asarray(bt),
                  jnp.asarray(np.minimum(pos, maxp * page - 1)))
    # In-range row identical to the oracle; overrun row finite (attends the
    # clamped page set, never garbage page ids).
    assert_allclose(np.asarray(got)[1], np.asarray(want)[1],
                    rtol=RTOL, atol=ATOL)
    assert np.isfinite(np.asarray(got)[0]).all()


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("win_count", [0, 1, 3])
def test_paged_attention_kernel_window_mode(rng, quant, win_count):
    """Deferred-commit window mode: kernel == XLA stacked oracle with the
    same in-flight window, for every visible count, fp32 and int8 pools."""
    from llama3np_tpu.ops import core as ops
    from llama3np_tpu.ops.kernels.paged_attention import (
        paged_attention as kernel)

    NL, B, P, maxp = 2, 3, 17, 4
    nh, kvh, hd, page, Q = 4, 2, 32, 8, 4
    li = 1
    q = jnp.asarray(rng.standard_normal((B, 1, nh, hd)), jnp.float32)
    kp = rng.standard_normal((NL, P, kvh, page, hd)).astype(np.float32)
    vp = rng.standard_normal((NL, P, kvh, page, hd)).astype(np.float32)
    wk = rng.standard_normal((B, kvh, Q, hd)).astype(np.float32)
    wv = rng.standard_normal((B, kvh, Q, hd)).astype(np.float32)
    ck = rng.standard_normal((B, kvh, hd)).astype(np.float32)
    cv = rng.standard_normal((B, kvh, hd)).astype(np.float32)
    perm = rng.permutation(np.arange(1, P))[: B * maxp].reshape(B, maxp)
    bt = np.ascontiguousarray(perm).astype(np.int32)
    # pos is the DISPATCH-START position (pool holds < pos); row 0 has an
    # empty pool — the window/current columns are all it attends.
    pos = np.array([0, page + 3, maxp * page - Q], np.int32)
    bt[0, :] = 0
    bt[1, 2:] = 0

    kw_k = dict(k_scale_rows=None, v_scale_rows=None, cur_ks=None,
                cur_vs=None, win_ks=None, win_vs=None)
    kw_o = dict(k_scale_pool=None, v_scale_pool=None, cur_ks=None,
                cur_vs=None, win_ks=None, win_vs=None)
    if quant:
        def qz(x):
            qv, s = ops.quantize_kv_rows(jnp.asarray(x))
            return np.asarray(qv), np.asarray(s)
        kp, kps = qz(kp)
        vp, vps = qz(vp)
        wk, wks = qz(wk)
        wv, wvs = qz(wv)
        ck, cks = qz(ck)
        cv, cvs = qz(cv)
        kw_k = dict(
            k_scale_rows=ops.gather_page_scales_stacked(
                jnp.asarray(kps), li, jnp.asarray(bt)),
            v_scale_rows=ops.gather_page_scales_stacked(
                jnp.asarray(vps), li, jnp.asarray(bt)),
            cur_ks=jnp.asarray(cks), cur_vs=jnp.asarray(cvs),
            win_ks=jnp.asarray(wks), win_vs=jnp.asarray(wvs))
        kw_o = dict(k_scale_pool=jnp.asarray(kps),
                    v_scale_pool=jnp.asarray(vps),
                    cur_ks=jnp.asarray(cks), cur_vs=jnp.asarray(cvs),
                    win_ks=jnp.asarray(wks), win_vs=jnp.asarray(wvs))

    got = kernel(q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(bt),
                 jnp.asarray(pos), layer=li,
                 cur_k=jnp.asarray(ck), cur_v=jnp.asarray(cv),
                 win_k=jnp.asarray(wk), win_v=jnp.asarray(wv),
                 win_count=jnp.int32(win_count), interpret=True, **kw_k)
    want = ops.paged_attention_stacked(
        q, jnp.asarray(kp).astype(jnp.float32) if not quant else jnp.asarray(kp),
        jnp.asarray(vp).astype(jnp.float32) if not quant else jnp.asarray(vp),
        li, jnp.asarray(bt), jnp.asarray(pos),
        cur_k=jnp.asarray(ck), cur_v=jnp.asarray(cv),
        win_k=jnp.asarray(wk), win_v=jnp.asarray(wv),
        win_count=jnp.int32(win_count), **kw_o)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=RTOL, atol=ATOL)
