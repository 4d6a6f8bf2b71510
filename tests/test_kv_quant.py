"""int8 KV cache (serving kv_quant): quantization numerics, the three
attention realizations (dense ragged, paged XLA gather, paged Pallas
kernel), and the end-to-end BatchEngine contracts.

Accuracy contract mirrors the weight-int8 suite (tests/test_quant.py):
exact agreement with the fp oracle when cache rows sit on the int8 grid
(roundtrip is lossless there), a bounded envelope for random rows, and
schedule-independence of served streams."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama, forward_ragged_decode
from llama3np_tpu.ops import core as ops
from llama3np_tpu.serving import BatchEngine


def grid_rows(rng, shape):
    """Rows exactly representable on the per-row int8 grid: integer lattices
    in [-127, 127] with max exactly 127, times an arbitrary per-row scale."""
    q = rng.integers(-127, 128, size=shape).astype(np.float32)
    q[..., 0] = 127  # pin the row max so s = max/127 reproduces the lattice
    s = np.exp(rng.standard_normal(shape[:-1])).astype(np.float32)
    return q * s[..., None]


def test_quantize_kv_rows_roundtrip_exact_on_grid(rng):
    x = jnp.asarray(grid_rows(rng, (3, 1, 2, 16)))
    q, s = ops.quantize_kv_rows(x)
    assert q.dtype == jnp.int8
    assert_allclose(np.asarray(q, np.float32) * np.asarray(s)[..., None],
                    np.asarray(x), rtol=1e-6, atol=0)


def test_quantize_kv_rows_envelope(rng):
    x = jnp.asarray(rng.standard_normal((4, 1, 2, 64)).astype(np.float32))
    q, s = ops.quantize_kv_rows(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    # Max error of round-to-nearest on a 127-step grid: s/2 per element.
    assert np.abs(deq - np.asarray(x)).max() <= np.asarray(s).max() / 2 + 1e-7
    # All-zero rows must not divide by zero.
    q0, s0 = ops.quantize_kv_rows(jnp.zeros((1, 1, 1, 8)))
    assert np.asarray(q0).max() == 0 and np.isfinite(np.asarray(s0)).all()


def test_ragged_attention_int8_exact_on_grid(rng):
    B, KVH, G, M, HD = 2, 2, 3, 32, 16
    NH = KVH * G
    q = jnp.asarray(rng.standard_normal((B, 1, NH, HD)).astype(np.float32))
    kf = jnp.asarray(grid_rows(rng, (B, KVH, M, HD)))
    vf = jnp.asarray(grid_rows(rng, (B, KVH, M, HD)))
    pos = jnp.asarray([5, M - 1], jnp.int32)
    k8, ks = ops.quantize_kv_rows(kf)
    v8, vs = ops.quantize_kv_rows(vf)
    got = ops.ragged_cache_attention(q, k8, v8, pos, k_scale=ks, v_scale=vs)
    want = ops.ragged_cache_attention(q, kf, vf, pos)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_ragged_attention_int8_envelope(rng):
    B, KVH, G, M, HD = 2, 2, 2, 24, 32
    NH = KVH * G
    q = jnp.asarray(rng.standard_normal((B, 1, NH, HD)).astype(np.float32))
    kf = jnp.asarray(rng.standard_normal((B, KVH, M, HD)).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((B, KVH, M, HD)).astype(np.float32))
    pos = jnp.asarray([M - 1, 7], jnp.int32)
    k8, ks = ops.quantize_kv_rows(kf)
    v8, vs = ops.quantize_kv_rows(vf)
    got = ops.ragged_cache_attention(q, k8, v8, pos, k_scale=ks, v_scale=vs)
    want = ops.ragged_cache_attention(q, kf, vf, pos)
    # ~1% relative error envelope for 8-bit K and V at these magnitudes.
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 0.05
    assert np.abs(np.asarray(got) - np.asarray(want)).mean() < 0.01


def test_paged_attention_int8_matches_dense_ragged(rng):
    """XLA gather realization on int8 pools == dense ragged int8 attention
    on the same (gathered) rows."""
    B, KVH, G, HD, page, maxp = 2, 2, 2, 16, 8, 3
    NH = KVH * G
    P = 1 + B * maxp
    M = maxp * page
    q = jnp.asarray(rng.standard_normal((B, 1, NH, HD)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((P, KVH, page, HD)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((P, KVH, page, HD)).astype(np.float32))
    k8, ks = ops.quantize_kv_rows(kp)
    v8, vs = ops.quantize_kv_rows(vp)
    bt = np.arange(1, 1 + B * maxp, dtype=np.int32).reshape(B, maxp)
    pos = jnp.asarray([page + 2, M - 1], jnp.int32)
    got = ops.paged_attention(q, k8, v8, jnp.asarray(bt), pos,
                              k_scale=ks, v_scale=vs)
    # Dense equivalent: gather rows + scales by the same table.
    kg = k8[bt].transpose(0, 2, 1, 3, 4).reshape(B, KVH, M, HD)
    vg = v8[bt].transpose(0, 2, 1, 3, 4).reshape(B, KVH, M, HD)
    ksg = ops.gather_page_scales(ks, jnp.asarray(bt))
    vsg = ops.gather_page_scales(vs, jnp.asarray(bt))
    want = ops.ragged_cache_attention(q, kg, vg, pos, k_scale=ksg,
                                      v_scale=vsg)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_pallas_paged_kernel_int8_matches_xla(rng):
    """Page-streaming kernel with scale rows (interpret mode) vs the XLA
    gather oracle on the same int8 pools."""
    from llama3np_tpu.ops.kernels.paged_attention import (
        paged_attention as kernel, supports)

    assert supports(128, 32, jnp.int8)
    assert not supports(128, 16, jnp.int8)  # int8 sublane tile is 32

    B, KVH, G, HD, page, maxp = 3, 2, 2, 32, 8, 4
    NH = KVH * G
    P = 1 + B * maxp
    q = jnp.asarray(rng.standard_normal((B, 1, NH, HD)).astype(np.float32))
    kf = jnp.asarray(rng.standard_normal((P, KVH, page, HD)).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((P, KVH, page, HD)).astype(np.float32))
    k8, ks = ops.quantize_kv_rows(kf)
    v8, vs = ops.quantize_kv_rows(vf)
    perm = rng.permutation(np.arange(1, P))[: B * maxp].reshape(B, maxp)
    bt = np.ascontiguousarray(perm).astype(np.int32)
    pos = np.array([0, page + 3, maxp * page - 1], np.int32)
    bt[0, 1:] = 0
    bt[1, 2:] = 0

    kr = ops.gather_page_scales(ks, jnp.asarray(bt))
    vr = ops.gather_page_scales(vs, jnp.asarray(bt))
    got = kernel(q, k8, v8, jnp.asarray(bt), jnp.asarray(pos),
                 k_scale_rows=kr, v_scale_rows=vr, interpret=True)
    want = ops.paged_attention(q, k8, v8, jnp.asarray(bt), jnp.asarray(pos),
                               k_scale=ks, v_scale=vs)
    assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# End-to-end serving
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    args = preset("test-tiny")
    weights = synthetic_weights(args, seed=23)
    return args, weights, Llama(weights, args)


def int8_solo_stream(engine, prompt, n, paged):
    """Single-request int8-KV serving stream — the schedule-independence
    reference for the batched runs."""
    be = BatchEngine(engine, capacity=1, paged=paged, kv_quant="int8")
    req = be.submit(prompt, max_new_tokens=n)
    be.run_to_completion()
    assert req.done
    return req.generated


@pytest.mark.parametrize("paged", [False, True])
def test_int8_serving_schedule_independent(setup, rng, paged):
    """Streams under int8 KV must be a pure function of the request —
    identical across capacities, co-tenants, and admission order."""
    args, weights, engine = setup
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 7, 5)]
    wants = [int8_solo_stream(engine, p, 8, paged) for p in prompts]

    be = BatchEngine(engine, capacity=2, paged=paged, kv_quant="int8")
    r0 = be.submit(prompts[0], 8)
    be.step()
    r1 = be.submit(prompts[1], 8)
    be.step()
    r2 = be.submit(prompts[2], 8)
    be.run_to_completion()
    for req, want in zip([r0, r1, r2], wants):
        assert req.done
        assert req.generated == want, req.request_id


def test_int8_serving_close_to_fp_serving(setup, rng):
    """The quantized cache changes numerics, not behavior: on a tiny model
    the int8-KV stream should agree with the fp stream for the first tokens
    (drift beyond that is acceptable quantization divergence)."""
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=6).tolist()
    fp = BatchEngine(engine, capacity=1)
    q8 = BatchEngine(engine, capacity=1, kv_quant="int8")
    r_fp = fp.submit(prompt, 4)
    r_q8 = q8.submit(prompt, 4)
    fp.run_to_completion()
    q8.run_to_completion()
    assert r_q8.generated[0] == r_fp.generated[0]


def test_int8_serving_quantum_and_mixed(setup, rng):
    """Quantum decode + mixed lengths + slot reuse under int8 paged KV."""
    args, weights, engine = setup
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 6, 5)]
    wants = [int8_solo_stream(engine, p, 8, True) for p in prompts]
    be = BatchEngine(engine, capacity=2, paged=True, kv_quant="int8")
    reqs = [be.submit(p, 8) for p in prompts]
    while any(not r.done for r in reqs):
        be.step(quantum=3)
    for req, want in zip(reqs, wants):
        assert req.generated == want


def test_cache_nbytes_accounting():
    from llama3np_tpu.kvcache import cache_nbytes

    args = preset("llama3-8b")
    bf16 = cache_nbytes(args.replace(kv_dtype="bfloat16"), batch_size=1)
    q8 = cache_nbytes(args, batch_size=1, quant="int8")
    # int8 halves bf16 cache plus 1-f32-per-row scale overhead (HD=128).
    assert q8 / bf16 == pytest.approx((128 + 4) / 256)
