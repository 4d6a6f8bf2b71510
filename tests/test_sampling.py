"""Sampling policy tests (temperature / top-k / top-p — extension beyond the
reference's greedy-only scope)."""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.generate import Sampling
from llama3np_tpu.models.llama import Llama


@pytest.fixture(scope="module")
def eng():
    args = preset("test-tiny")
    return Llama(synthetic_weights(args, seed=9), args), args


def gen(engine, args, ids, n, sampling):
    return np.asarray(engine.generate_tokens(ids, n, sampling=sampling))[0].tolist()


def test_temperature_zero_is_greedy(eng, rng):
    engine, args = eng
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    greedy = gen(engine, args, ids, 10, None)
    t0 = gen(engine, args, ids, 10, Sampling(temperature=0.0, seed=3))
    assert t0 == greedy


def test_seed_reproducible_and_varies(eng, rng):
    engine, args = eng
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    a1 = gen(engine, args, ids, 12, Sampling(temperature=1.0, seed=1))
    a2 = gen(engine, args, ids, 12, Sampling(temperature=1.0, seed=1))
    b = gen(engine, args, ids, 12, Sampling(temperature=1.0, seed=2))
    assert a1 == a2
    assert a1 != b  # astronomically unlikely to collide at temp 1.0


def test_top_k_one_is_greedy(eng, rng):
    engine, args = eng
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    greedy = gen(engine, args, ids, 10, None)
    k1 = gen(engine, args, ids, 10, Sampling(temperature=0.7, top_k=1, seed=5))
    assert k1 == greedy


def test_tiny_top_p_is_greedy(eng, rng):
    engine, args = eng
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    greedy = gen(engine, args, ids, 10, None)
    p0 = gen(engine, args, ids, 10, Sampling(temperature=0.9, top_p=1e-6, seed=5))
    assert p0 == greedy


def test_sample_token_masks():
    import jax
    import jax.numpy as jnp
    from llama3np_tpu.generate import sample_token

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0]])
    # top_k=2 keeps ids {2, 3} only.
    draws = {int(sample_token(logits, jax.random.PRNGKey(s),
                              Sampling(temperature=5.0, top_k=2))[0])
             for s in range(50)}
    assert draws <= {2, 3} and len(draws) == 2
    # top_p small keeps only the argmax.
    draws_p = {int(sample_token(logits, jax.random.PRNGKey(s),
                                Sampling(temperature=5.0, top_p=0.05))[0])
               for s in range(20)}
    assert draws_p == {3}
