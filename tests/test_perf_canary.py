"""Performance canaries (observational, like the reference's
tests/test_dtype_comparison.py:130-210 microbenchmarks): timings print with
`-s`; asserts are sanity floors only, loose enough for CI CPUs."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _bench(fn, *args, reps=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.parametrize("n", [128, 256, 512, 1024])
def test_matmul_sweep(n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    f = jax.jit(lambda x: x @ x)
    dt = _bench(f, a)
    gflops = 2 * n**3 / dt / 1e9
    print(f"matmul {n}x{n}: {dt*1e6:.0f} us  {gflops:.1f} GFLOP/s")
    assert dt < 1.0


def test_generate_throughput_canary(tiny_args, tiny_weights):
    """End-to-end decode rate on the tiny model must beat the reference's
    CPU headline (33 tok/s) even on the CI CPU backend."""
    from llama3np_tpu.models.llama import Llama

    eng = Llama(tiny_weights, tiny_args)
    ids = np.array([[5, 6, 7]], np.int32)
    np.asarray(eng.generate_tokens(ids, 16))  # compile
    t0 = time.perf_counter()
    np.asarray(eng.generate_tokens(ids, 16))
    rate = 16 / (time.perf_counter() - t0)
    print(f"tiny-model decode: {rate:.0f} tok/s on {jax.default_backend()}")
    assert rate > 33


def test_tokenizer_encode_speed():
    """Hash-map encode must stay far below the reference's O(len^2 * V)."""
    import os
    from llama3np_tpu.tokenizer import Tokenizer
    from conftest import REFERENCE_TOKENIZER

    if not os.path.exists(REFERENCE_TOKENIZER):
        pytest.skip("real vocab unavailable")
    tok = Tokenizer(REFERENCE_TOKENIZER)
    text = "Once upon a time there was a little robot. " * 20
    t0 = time.perf_counter()
    ids = tok.encode(text)
    dt = time.perf_counter() - t0
    print(f"encode {len(text)} chars -> {len(ids)} tokens in {dt*1e3:.1f} ms")
    assert dt < 5.0
