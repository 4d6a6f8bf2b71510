"""Full-model parity: jitted TPU-path forward/generate vs the NumPy oracle.

Mirrors the reference's parity suite (reference
tests/test_llama_implementations.py) at the same tolerance envelope
(rtol 2e-4 / atol 1e-4, quirk Q5) with its top-5 semantic check, extended with
the checks the reference lacks: greedy token-stream identity, decode-phase
parity, chunked prefill, and padded-vs-exact prefill equivalence.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from llama3np_tpu import NumpyLlama
from llama3np_tpu.models.llama import Llama

ATOL = 1e-4
RTOL = 2e-4


def top_k(logits, k=5):
    return np.argsort(logits)[-k:][::-1]


@pytest.fixture(params=["tiny", "mha"])
def model_pair(request, tiny_args, tiny_weights, mha_args, mha_weights):
    if request.param == "tiny":
        args, weights = tiny_args, tiny_weights
    else:
        args, weights = mha_args, mha_weights
    from llama3np_tpu import build_param_tree
    oracle = NumpyLlama(build_param_tree(weights, args), args)
    engine = Llama(weights, args)
    return engine, oracle, args


def test_prefill_logits_parity(model_pair, rng):
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 8)).astype(np.int32)
    got = engine(ids, 0)
    want = oracle(ids, 0)
    assert got.shape == want.shape == (1, 1, args.vocab_size)
    assert np.array_equal(top_k(got[0, 0]), top_k(want[0, 0]))
    assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_decode_logits_parity(model_pair, rng):
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 5)).astype(np.int32)
    engine(ids, 0)
    oracle(ids, 0)
    # Three single-token decode steps at contiguous positions.
    for step in range(3):
        tok = rng.integers(3, args.vocab_size, size=(1, 1)).astype(np.int32)
        got = engine(tok, 5 + step)
        want = oracle(tok, 5 + step)
        assert_allclose(got, want, rtol=RTOL, atol=ATOL)
        assert np.array_equal(top_k(got[0, 0]), top_k(want[0, 0]))


def test_chunked_prefill_parity(model_pair, rng):
    """Chunked prefill (L>1 at start_pos>0) — the rectangular-mask path the
    reference builds but never exercises (quirk Q7)."""
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 12)).astype(np.int32)
    engine(ids[:, :6], 0)
    oracle(ids[:, :6], 0)
    got = engine(ids[:, 6:], 6)
    want = oracle(ids[:, 6:], 6)
    assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_chunked_equals_whole(model_pair, rng):
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 10)).astype(np.int32)
    whole = Llama(_weights_of(model_pair), args)
    got_whole = whole(ids, 0)
    engine.reset()
    engine(ids[:, :7], 0)
    got_chunked = engine(ids[:, 7:], 7)
    assert_allclose(got_chunked, got_whole, rtol=RTOL, atol=ATOL)


def _weights_of(model_pair):
    # Rebuild HF-schema weights is overkill; reuse the engine's own params by
    # round-tripping through the oracle's tree (same structure).
    engine, oracle, args = model_pair
    return _tree_to_weights(oracle.params, args)


def _tree_to_weights(params, args):
    out = {
        "model.embed_tokens.weight": np.asarray(params["tok_embedding"]),
        "model.norm.weight": np.asarray(params["norm"]),
        "lm_head.weight": np.asarray(params["lm_head"]).T,
    }
    ly = params["layers"]
    names = {
        "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
        "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
        "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
        "w_down": "mlp.down_proj",
    }
    for i in range(args.n_layers):
        for key, name in names.items():
            out[f"model.layers.{i}.{name}.weight"] = np.asarray(ly[key][i]).T
        out[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(ly["attn_norm"][i])
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(ly["ffn_norm"][i])
    return out


def test_greedy_token_identity(model_pair, rng):
    """The BASELINE acceptance gate: greedy streams must match the NumPy
    reference token-for-token."""
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    n = 12
    got = np.asarray(engine.generate_tokens(ids, n))[0].tolist()
    oracle.reset_cache()
    want = []
    gen = oracle.generate(ids, n + ids.shape[1])
    for t in gen:
        want.append(int(t[0, -1]))
        if len(want) == n:
            break
    assert got == want


def test_generate_count_semantics(model_pair, rng):
    """Llama.generate honors the reference's total-length bound (quirk Q2)."""
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    toks = list(engine.generate(ids, 10))
    assert len(toks) == 10 - 4
    assert all(t.shape == (1, 1) for t in toks)


def test_padded_prefill_matches_exact(model_pair, rng):
    """Bucket padding must not change results: prompt of length 5 padded to a
    16-bucket equals an exact-length prefill."""
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 5)).astype(np.int32)
    got = np.asarray(engine.generate_tokens(ids, 8))[0].tolist()
    # Exact path: reference-style step-by-step via __call__.
    engine.reset()
    logits = engine(ids, 0)
    want = [int(logits[0, -1].argmax())]
    pos = ids.shape[1]
    while len(want) < 8:
        logits = engine(np.array([[want[-1]]], np.int32), pos)
        want.append(int(logits[0, -1].argmax()))
        pos += 1
    assert got == want


# Committed golden streams (synthetic seed 7, prompt [3, 11, 42, 7]) pin the
# numerics across refactors — unlike the live oracle comparison, these catch
# the engine and oracle drifting together (SURVEY §4 "golden-token tests").
GOLDEN_STREAMS = {
    "test-tiny": [342, 342, 342, 159, 239, 239, 239, 239, 239, 288, 293, 491],
    "test-tiny-mha": [144, 188, 244, 135, 216, 62, 74, 169, 119, 60, 114, 224],
}


@pytest.mark.parametrize("name", sorted(GOLDEN_STREAMS))
def test_golden_token_streams(name):
    from llama3np_tpu import preset, synthetic_weights

    args = preset(name)
    eng = Llama(synthetic_weights(args, seed=7), args)
    ids = np.array([[3, 11, 42, 7]], np.int32)
    got = np.asarray(eng.generate_tokens(ids, 12))[0].tolist()
    assert got == GOLDEN_STREAMS[name]


def test_batch_generation(tiny_args, tiny_weights, rng):
    """Batched decode: each row matches its own single-row generation."""
    args = tiny_args.replace(max_batch_size=3)
    engine = Llama(tiny_weights, args)
    ids = rng.integers(3, args.vocab_size, size=(3, 6)).astype(np.int32)
    toks = np.asarray(engine.generate_tokens(ids, 6))
    for b in range(3):
        single = Llama(tiny_weights, tiny_args)
        want = np.asarray(single.generate_tokens(ids[b : b + 1], 6))[0]
        assert toks[b].tolist() == want.tolist()


def test_plan_decode_segments_properties():
    """Segment plans cover `rest` with <=15 discarded steps (VERDICT r2
    weak #5: a 513-token request must not run a 1024-step scan), every
    segment is a shared-compile bucket size (or the clamped tail), and the
    cache bound M - L - 1 is never exceeded."""
    from llama3np_tpu.generate import DECODE_BUCKETS, plan_decode_segments

    M = 8192
    for L in (5, 100, 511):
        for rest in (1, 15, 16, 17, 33, 255, 513, 1000, 1008, 2049,
                     M - L - 1):
            segs = plan_decode_segments(rest, L, M)
            total = sum(segs)
            assert total >= rest, (rest, segs)
            assert total - rest <= 15, (rest, segs)
            assert L + 1 + total <= M + 1, (L, rest, segs)
            assert all(s in DECODE_BUCKETS or s % 16 == 0 or
                       L + 1 + total == M for s in segs)
    # Near capacity: the tail clamps to the exact remaining room.
    segs = plan_decode_segments(58, 5, 64)
    assert sum(segs) == 58


def test_segmented_decode_token_identity(model_pair, rng):
    """A generation long enough to span multiple scan segments must produce
    the same greedy stream as the NumPy oracle (segment chaining is pure
    carry continuation)."""
    engine, oracle, args = model_pair
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    from llama3np_tpu.generate import plan_decode_segments
    # rest=33 -> [32, 16] on the default buckets (capacity permitting).
    n = min(34, args.max_seq_len - ids.shape[1])
    assert len(plan_decode_segments(n - 1, 4, args.max_seq_len)) > 1
    got = np.asarray(engine.generate_tokens(ids, n))[0].tolist()
    oracle.reset_cache()
    want = []
    for t in oracle.generate(ids, n + ids.shape[1]):
        want.append(int(t[0, -1]))
        if len(want) == n:
            break
    assert got == want
