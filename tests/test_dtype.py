"""Dtype matrix: fp32 vs bf16 (the TPU-relevant pair) plus fp16 (the
reference's own dtype knob, tests/test_dtype_comparison.py +
llama3_simple.py:209-212 — supported here for drop-in compatibility; bf16 is
the TPU-native choice).

As in the reference, the cross-dtype comparisons are observational canaries
(loose tolerances, top-1 agreement) — 16-bit is not bit-parity with fp32.
"""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama


@pytest.fixture(scope="module")
def pair(rng_seed=21):
    args32 = preset("test-tiny", dtype="float32")
    args16 = preset("test-tiny", dtype="bfloat16")
    weights = synthetic_weights(args32, seed=rng_seed)
    return Llama(weights, args32), Llama(weights, args16), args32


def test_bf16_param_dtype(pair):
    _, e16, _ = pair
    import jax.numpy as jnp
    assert e16.params["layers"]["wqkv"].dtype == jnp.bfloat16


def test_bf16_forward_close(pair, rng):
    e32, e16, args = pair
    ids = rng.integers(3, args.vocab_size, size=(1, 6)).astype(np.int32)
    l32 = e32(ids, 0)
    l16 = np.asarray(e16(ids, 0), np.float32)
    # Loose envelope: bf16 has ~3 decimal digits.
    assert np.abs(l32 - l16).max() < 0.15 * max(1.0, np.abs(l32).max())
    assert l32[0, 0].argmax() == l16[0, 0].argmax()


def test_bf16_generation_runs(pair, rng):
    _, e16, args = pair
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    toks = np.asarray(e16.generate_tokens(ids, 8))
    assert toks.shape == (1, 8)
    assert (toks >= 0).all() and (toks < args.vocab_size).all()


@pytest.fixture(scope="module")
def fp16_pair():
    args32 = preset("test-tiny", dtype="float32")
    args16 = preset("test-tiny", dtype="float16")
    weights = synthetic_weights(args32, seed=21)
    return Llama(weights, args32), Llama(weights, args16), args32


def test_fp16_param_dtype(fp16_pair):
    _, e16, _ = fp16_pair
    import jax.numpy as jnp
    assert e16.params["layers"]["wqkv"].dtype == jnp.float16
    assert e16.cache["k"].dtype == jnp.float16


def test_fp16_forward_close(fp16_pair, rng):
    # fp16 has a 10-bit mantissa — tighter than bf16 at these magnitudes.
    e32, e16, args = fp16_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 6)).astype(np.int32)
    l32 = e32(ids, 0)
    l16 = np.asarray(e16(ids, 0), np.float32)
    assert np.abs(l32 - l16).max() < 0.02 * max(1.0, np.abs(l32).max())
    assert l32[0, 0].argmax() == l16[0, 0].argmax()


def test_fp16_generation_runs(fp16_pair, rng):
    _, e16, args = fp16_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    toks = np.asarray(e16.generate_tokens(ids, 8))
    assert toks.shape == (1, 8)
    assert (toks >= 0).all() and (toks < args.vocab_size).all()


def test_kv_dtype_override(rng):
    args = preset("test-tiny", dtype="float32", kv_dtype="bfloat16")
    import jax.numpy as jnp
    eng = Llama(synthetic_weights(args, seed=3), args)
    assert eng.cache["k"].dtype == jnp.bfloat16
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    toks = np.asarray(eng.generate_tokens(ids, 6))
    assert toks.shape == (1, 6)
