"""Speculative decoding (llama3np_tpu.speculative): greedy losslessness —
the emitted stream must equal the target-only greedy stream regardless of
draft quality — plus acceptance accounting and validation.

The reference has no speculative decoding; this is TPU-native new
capability layered on the engine's forward/cache invariants."""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.speculative import SpeculativeGenerator, quantized_draft

# Heavy compile/soak lane: nightly full suite only (pyproject 'slow').
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    args = preset("test-tiny")
    weights = synthetic_weights(args, seed=7)
    return args, weights


@pytest.fixture(scope="module")
def target(tiny):
    args, weights = tiny
    return Llama(weights, args)


def solo_stream(engine, ids, n):
    engine.reset()
    return np.asarray(engine.generate_tokens(ids, n)).tolist()


def test_self_draft_identity_and_high_acceptance(tiny, target, rng):
    """Quantized self-speculation: int8 draft of the same weights — stream
    identical to the target-only stream, acceptance near 1."""
    args, weights = tiny
    ids = rng.integers(3, args.vocab_size, size=(1, 5)).astype(np.int32)
    want = solo_stream(target, ids, 24)

    spec = SpeculativeGenerator(target, quantized_draft(weights, args), k=4)
    got = spec.generate_tokens(ids, 24)
    assert got.tolist() == want
    assert spec.last_stats["tokens"] >= 24
    assert spec.last_stats["accept_rate"] >= 0.5  # int8 tracks fp32 closely


def test_unrelated_draft_still_lossless(tiny, target, rng):
    """A draft with DIFFERENT weights proposes garbage (acceptance ~0) —
    the verify pass must still reproduce the target stream exactly, one
    bonus token per round."""
    args, weights = tiny
    bad = Llama(synthetic_weights(args, seed=99), args)
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    want = solo_stream(target, ids, 12)

    spec = SpeculativeGenerator(target, bad, k=3)
    got = spec.generate_tokens(ids, 12)
    assert got.tolist() == want
    assert spec.last_stats["accept_rate"] <= 0.5


def test_perfect_draft_accepts_everything(tiny, target, rng):
    """draft == target (same params): every proposal matches, a == k every
    round, rounds ~= ceil((n-1) / (k+1))."""
    args, weights = tiny
    twin = Llama(weights, args)
    ids = rng.integers(3, args.vocab_size, size=(1, 5)).astype(np.int32)
    want = solo_stream(target, ids, 22)

    spec = SpeculativeGenerator(target, twin, k=4)
    got = spec.generate_tokens(ids, 22)
    assert got.tolist() == want
    assert spec.last_stats["accept_rate"] >= 0.95
    assert spec.last_stats["rounds"] <= -(-21 // 5) + 1


def test_various_k_and_lengths(tiny, target, rng):
    args, weights = tiny
    draft = quantized_draft(weights, args)
    ids = rng.integers(3, args.vocab_size, size=(1, 9)).astype(np.int32)
    for k in (1, 2, 6):
        for n in (1, 5, 17):
            want = solo_stream(target, ids, n)
            spec = SpeculativeGenerator(target, draft, k=k)
            assert spec.generate_tokens(ids, n).tolist() == want, (k, n)


def test_validation(tiny, target):
    args, weights = tiny
    draft = quantized_draft(weights, args)
    spec = SpeculativeGenerator(target, draft, k=4)
    with pytest.raises(ValueError, match="single-stream"):
        spec.generate_tokens(np.ones((2, 4), np.int32), 4)
    with pytest.raises(ValueError, match="max_seq_len"):
        spec.generate_tokens(np.ones((1, 4), np.int32),
                             args.max_seq_len)
    with pytest.raises(ValueError, match="k must be"):
        SpeculativeGenerator(target, draft, k=0)
    import dataclasses
    other = Llama(synthetic_weights(
        dataclasses.replace(args, vocab_size=args.vocab_size * 2), seed=1),
        dataclasses.replace(args, vocab_size=args.vocab_size * 2))
    with pytest.raises(ValueError, match="vocabulary"):
        SpeculativeGenerator(target, other)
