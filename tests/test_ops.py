"""Per-op parity: jitted XLA ops vs the NumPy oracle (the reference's
dual-implementation strategy, retargeted — SURVEY §4)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from llama3np_tpu.ops import core as ops
from llama3np_tpu import reference_numpy as ref

ATOL, RTOL = 1e-5, 1e-5  # per-op f32 on CPU: tight


def test_rms_norm(rng):
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    got = jax.jit(ops.rms_norm, static_argnames="eps")(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    want = ref.rmsnorm_np(x, w, 1e-6)
    assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_rope_tables_match(rng):
    cos_j, sin_j = ops.rope_tables(48, 256, 10000.0)
    cos_n, sin_n = ref.rope_tables_np(48, 256, 10000.0)
    assert_allclose(np.asarray(cos_j), cos_n, rtol=1e-6, atol=1e-6)
    assert_allclose(np.asarray(sin_j), sin_n, rtol=1e-6, atol=1e-6)


def test_apply_rope(rng):
    B, L, H, HD = 2, 8, 4, 16
    x = rng.standard_normal((B, L, H, HD)).astype(np.float32)
    cos, sin = ref.rope_tables_np(HD, 32)
    got = jax.jit(ops.apply_rope)(jnp.asarray(x), jnp.asarray(cos[:L]), jnp.asarray(sin[:L]))
    want = ref.apply_rope_np(x, cos[:L], sin[:L])
    assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_rope_split_equivalence(rng):
    """Scores with split-layout RoPE on permuted Q/K == interleaved RoPE on
    the originals (the load-time wq/wk permutation is exact)."""
    B, L, H, HD = 1, 6, 4, 16
    q = rng.standard_normal((B, L, H, HD)).astype(np.float32)
    k = rng.standard_normal((B, L, H, HD)).astype(np.float32)
    cos, sin = ref.rope_tables_np(HD, 32)
    perm = ops.rope_split_permutation(H, HD)

    q_int = ref.apply_rope_np(q, cos[:L], sin[:L])
    k_int = ref.apply_rope_np(k, cos[:L], sin[:L])
    want = np.einsum("blhd,bmhd->bhlm", q_int, k_int)

    qp = q.reshape(B, L, -1)[..., perm].reshape(B, L, H, HD)
    kp = k.reshape(B, L, -1)[..., perm].reshape(B, L, H, HD)
    q_spl = np.asarray(ops.apply_rope_split(jnp.asarray(qp), jnp.asarray(cos[:L]), jnp.asarray(sin[:L])))
    k_spl = np.asarray(ops.apply_rope_split(jnp.asarray(kp), jnp.asarray(cos[:L]), jnp.asarray(sin[:L])))
    got = np.einsum("blhd,bmhd->bhlm", q_spl, k_spl)
    assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_swiglu(rng):
    x = rng.standard_normal((1, 4, 32)).astype(np.float32)
    wg = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    wu = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    wd = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    got = jax.jit(ops.swiglu)(*map(jnp.asarray, (x, wg, wu, wd)))
    want = ref.silu_np(x @ wg) * (x @ wu) @ wd
    assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nh,kvh", [(4, 4), (4, 2), (6, 2)])
def test_causal_attention_vs_numpy(rng, nh, kvh):
    B, L, HD = 2, 8, 16
    q = rng.standard_normal((B, L, nh, HD)).astype(np.float32)
    k = rng.standard_normal((B, L, kvh, HD)).astype(np.float32)
    v = rng.standard_normal((B, L, kvh, HD)).astype(np.float32)
    got = jax.jit(ops.causal_attention)(*map(jnp.asarray, (q, k, v)))

    # NumPy oracle: repeat KV heads, dense causal softmax-attention.
    n_rep = nh // kvh
    kr = np.repeat(k, n_rep, axis=2).transpose(0, 2, 1, 3)
    vr = np.repeat(v, n_rep, axis=2).transpose(0, 2, 1, 3)
    qt = q.transpose(0, 2, 1, 3)
    scores = qt @ kr.transpose(0, 1, 3, 2) / np.sqrt(HD)
    mask = np.triu(np.full((L, L), -np.inf, np.float32), k=1)
    want = (ref.softmax_np(scores + mask) @ vr).transpose(0, 2, 1, 3)
    assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("L,pos", [(1, 0), (1, 5), (4, 3)])
def test_cache_attention_vs_numpy(rng, L, pos):
    B, NH, KVH, HD, M = 1, 4, 2, 16, 16
    q = rng.standard_normal((B, L, NH, HD)).astype(np.float32)
    # A cache whose first pos+L slots are "written"; tail is garbage that the
    # mask must exclude.
    k_hist = rng.standard_normal((B, M, KVH, HD)).astype(np.float32)
    v_hist = rng.standard_normal((B, M, KVH, HD)).astype(np.float32)

    k_cache = jnp.asarray(k_hist.transpose(0, 2, 1, 3))  # [B,KVH,M,HD]
    v_cache = jnp.asarray(v_hist.transpose(0, 2, 1, 3))  # [B,KVH,M,HD]
    got = jax.jit(ops.cache_attention)(jnp.asarray(q), k_cache, v_cache, jnp.int32(pos))

    # Oracle attends slices [0 : pos+l+1] per query row l.
    n_rep = NH // KVH
    out = np.zeros((B, L, NH, HD), np.float32)
    for l in range(L):
        T = pos + l + 1
        kr = np.repeat(k_hist[:, :T], n_rep, axis=2).transpose(0, 2, 1, 3)
        vr = np.repeat(v_hist[:, :T], n_rep, axis=2).transpose(0, 2, 1, 3)
        qt = q[:, l : l + 1].transpose(0, 2, 1, 3)
        scores = qt @ kr.transpose(0, 1, 3, 2) / np.sqrt(HD)
        out[:, l] = (ref.softmax_np(scores) @ vr)[:, :, 0, :]
    assert_allclose(np.asarray(got), out, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pos,L,T,blk", [(0, 32, 32, 8), (16, 32, 64, 16), (0, 64, 64, 64)])
def test_blockwise_matches_dense(rng, pos, L, T, blk):
    """Flash-semantics blockwise accumulation == dense cache attention."""
    B, NH, KVH, HD = 2, 4, 2, 16
    q = rng.standard_normal((B, L, NH, HD)).astype(np.float32)
    k = rng.standard_normal((B, T, KVH, HD)).astype(np.float32)
    v = rng.standard_normal((B, T, KVH, HD)).astype(np.float32)
    got = jax.jit(ops.blockwise_causal_attention, static_argnames="kv_block")(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(pos),
        kv_block=blk,
    )
    want = ops.cache_attention(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)), jnp.int32(pos),
    )
    assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-5)


def test_long_prefill_blockwise_path(rng):
    """Model-level: a prompt long enough to trigger the blockwise path must
    produce the same logits as the dense configuration."""
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama

    args_b = preset("test-tiny", max_seq_len=128, prefill_kv_block=32,
                    prefill_buckets=(64, 128))
    args_d = args_b.replace(prefill_kv_block=0)
    weights = synthetic_weights(args_b, seed=17)
    ids = rng.integers(3, args_b.vocab_size, size=(1, 70)).astype(np.int32)
    blockwise = Llama(weights, args_b)
    dense = Llama(weights, args_d)
    got = np.asarray(blockwise.generate_tokens(ids, 6))[0].tolist()
    want = np.asarray(dense.generate_tokens(ids, 6))[0].tolist()
    assert got == want

    # Chunked prefill (L>1 at pos>0) also routes through the blockwise
    # accumulation over the cache; logits must match the dense config.
    blockwise.reset()
    dense.reset()
    blockwise(ids[:, :40], 0)
    dense(ids[:, :40], 0)
    lb = blockwise(ids[:, 40:], 40)
    ld = dense(ids[:, 40:], 40)
    assert_allclose(lb, ld, rtol=2e-4, atol=1e-4)


def test_update_kv_cache(rng):
    B, L, KVH, HD, M = 1, 3, 2, 8, 16
    k = rng.standard_normal((B, L, KVH, HD)).astype(np.float32)
    v = rng.standard_normal((B, L, KVH, HD)).astype(np.float32)
    kc = jnp.zeros((B, KVH, M, HD))
    vc = jnp.zeros((B, KVH, M, HD))
    kc, vc = jax.jit(ops.update_kv_cache)(kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.int32(5))
    assert_allclose(np.asarray(kc)[:, :, 5:8], k.transpose(0, 2, 1, 3), rtol=0, atol=0)
    assert_allclose(np.asarray(vc)[:, :, 5:8], v.transpose(0, 2, 1, 3), rtol=0, atol=0)
    assert np.asarray(kc)[:, :, :5].sum() == 0
    assert np.asarray(vc)[:, :, 8:].sum() == 0


def _quantize_rows(x):
    q, s = ops.quantize_kv_rows(jnp.asarray(x))
    return np.asarray(q), np.asarray(s)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("win_count", [0, 2, 4])
def test_ragged_window_attention_matches_committed(rng, quant, win_count):
    """Deferred-commit window mode (models/llama.py quantum scans) must equal
    attending a cache that already holds the window rows at their final
    slots — for every in-flight count, fp32 and int8 pools."""
    B, KVH, G, HD, M, Q = 3, 2, 2, 16, 24, 4
    NH = KVH * G
    q = jnp.asarray(rng.standard_normal((B, 1, NH, HD)), jnp.float32)
    kc = rng.standard_normal((B, KVH, M, HD)).astype(np.float32)
    vc = rng.standard_normal((B, KVH, M, HD)).astype(np.float32)
    wk = rng.standard_normal((B, KVH, Q, HD)).astype(np.float32)
    wv = rng.standard_normal((B, KVH, Q, HD)).astype(np.float32)
    ck = rng.standard_normal((B, KVH, HD)).astype(np.float32)
    cv = rng.standard_normal((B, KVH, HD)).astype(np.float32)
    pos0 = np.array([0, 5, M - Q], np.int32)  # cache holds tokens < pos0

    kw = dict(k_scale=None, v_scale=None, cur_ks=None, cur_vs=None,
              win_ks=None, win_vs=None)
    if quant:
        kc, ks = _quantize_rows(kc)
        vc, vs = _quantize_rows(vc)
        wk, wks = _quantize_rows(wk)
        wv, wvs = _quantize_rows(wv)
        ck, cks = _quantize_rows(ck)
        cv, cvs = _quantize_rows(cv)
        kw = dict(k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
                  cur_ks=jnp.asarray(cks), cur_vs=jnp.asarray(cvs),
                  win_ks=jnp.asarray(wks), win_vs=jnp.asarray(wvs))

    got = ops.ragged_cache_attention(
        q, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(pos0),
        cur_k=jnp.asarray(ck), cur_v=jnp.asarray(cv),
        win_k=jnp.asarray(wk), win_v=jnp.asarray(wv),
        win_count=jnp.int32(win_count), **kw)

    # Committed form: window columns < win_count written at pos0 + j.
    kc2, vc2 = kc.copy(), vc.copy()
    for b in range(B):
        for j in range(win_count):
            kc2[b, :, pos0[b] + j] = wk[b, :, j]
            vc2[b, :, pos0[b] + j] = wv[b, :, j]
    kw2 = dict(kw)
    kw2.pop("win_ks"), kw2.pop("win_vs")
    if quant:
        ks2, vs2 = np.asarray(kw["k_scale"]).copy(), np.asarray(kw["v_scale"]).copy()
        for b in range(B):
            for j in range(win_count):
                ks2[b, :, pos0[b] + j] = np.asarray(kw["win_ks"])[b, :, j]
                vs2[b, :, pos0[b] + j] = np.asarray(kw["win_vs"])[b, :, j]
        kw2["k_scale"], kw2["v_scale"] = jnp.asarray(ks2), jnp.asarray(vs2)
    want = ops.ragged_cache_attention(
        q, jnp.asarray(kc2), jnp.asarray(vc2),
        jnp.asarray(pos0 + win_count),
        cur_k=jnp.asarray(ck), cur_v=jnp.asarray(cv), **kw2)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("quant", [False, True])
def test_commit_window_dense_matches_per_step(rng, quant):
    """One post-scan window scatter == Q sequential per-step commits
    (including an overrun row whose tail positions fall off the cache)."""
    NL, B, KVH, M, HD, Q = 2, 3, 2, 16, 8, 4
    pos0 = np.array([0, 5, M - 2], np.int32)  # row 2 overruns at step 2+
    win = {"k": rng.standard_normal((NL, B, KVH, Q, HD)).astype(np.float32),
           "v": rng.standard_normal((NL, B, KVH, Q, HD)).astype(np.float32)}
    cache = {"k": jnp.asarray(rng.standard_normal((NL, B, KVH, M, HD)),
                              jnp.float32),
             "v": jnp.asarray(rng.standard_normal((NL, B, KVH, M, HD)),
                              jnp.float32)}
    if quant:
        win["k_s"] = rng.standard_normal((NL, B, KVH, Q)).astype(np.float32)
        win["v_s"] = rng.standard_normal((NL, B, KVH, Q)).astype(np.float32)
        cache["k_s"] = jnp.asarray(
            rng.standard_normal((NL, B, KVH, M)), jnp.float32)
        cache["v_s"] = jnp.asarray(
            rng.standard_normal((NL, B, KVH, M)), jnp.float32)

    got = ops.commit_window_dense(
        cache, jax.tree.map(jnp.asarray, win), jnp.asarray(pos0), Q)

    want = dict(cache)
    for s in range(Q):
        extra = ((win["k_s"][:, :, :, s], win["v_s"][:, :, :, s])
                 if quant else ())
        want = ops.commit_decode_rows_dense(
            want, jnp.asarray(win["k"][:, :, :, s]),
            jnp.asarray(win["v"][:, :, :, s]),
            jnp.asarray(pos0 + s), *map(jnp.asarray, extra))
    for key in got:
        assert_allclose(np.asarray(got[key]), np.asarray(want[key]),
                        rtol=0, atol=0, err_msg=key)


@pytest.mark.parametrize("quant", [False, True])
def test_commit_window_paged_matches_per_step(rng, quant):
    """Paged window commit == Q sequential paged commits through the block
    table (overrun steps clamp into the row's last table entry)."""
    NL, B, KVH, page, HD, Q, P, maxp = 2, 3, 2, 4, 8, 4, 11, 3
    pos0 = np.array([0, 5, maxp * page - 2], np.int32)  # row 2 overruns
    bt = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.int32)
    win = {"k": rng.standard_normal((NL, B, KVH, Q, HD)).astype(np.float32),
           "v": rng.standard_normal((NL, B, KVH, Q, HD)).astype(np.float32)}
    cache = {"k": jnp.asarray(rng.standard_normal((NL, P, KVH, page, HD)),
                              jnp.float32),
             "v": jnp.asarray(rng.standard_normal((NL, P, KVH, page, HD)),
                              jnp.float32)}
    if quant:
        win["k_s"] = rng.standard_normal((NL, B, KVH, Q)).astype(np.float32)
        win["v_s"] = rng.standard_normal((NL, B, KVH, Q)).astype(np.float32)
        cache["k_s"] = jnp.asarray(
            rng.standard_normal((NL, P, KVH, page)), jnp.float32)
        cache["v_s"] = jnp.asarray(
            rng.standard_normal((NL, P, KVH, page)), jnp.float32)

    got = ops.commit_window_paged(
        cache, jax.tree.map(jnp.asarray, win), jnp.asarray(pos0),
        jnp.asarray(bt), Q)

    want = dict(cache)
    for s in range(Q):
        pos = pos0 + s
        page_ids = bt[np.arange(B), np.minimum(pos // page, maxp - 1)]
        extra = ((win["k_s"][:, :, :, s], win["v_s"][:, :, :, s])
                 if quant else ())
        want = ops.commit_decode_rows_paged(
            want, jnp.asarray(win["k"][:, :, :, s]),
            jnp.asarray(win["v"][:, :, :, s]),
            jnp.asarray(page_ids), jnp.asarray(pos % page),
            *map(jnp.asarray, extra))
    for key in got:
        assert_allclose(np.asarray(got[key]), np.asarray(want[key]),
                        rtol=0, atol=0, err_msg=key)
