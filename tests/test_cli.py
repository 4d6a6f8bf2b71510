"""CLI + observability smoke tests (CPU)."""

import json
import os

import numpy as np
import pytest

from conftest import REFERENCE_TOKENIZER

needs_real_vocab = pytest.mark.skipif(
    not os.path.exists(REFERENCE_TOKENIZER),
    reason="reference tokenizer.model.np not available",
)


@needs_real_vocab
def test_extended_cli_synthetic(capsys, tmp_path):
    from llama3np_tpu.cli import main

    log = tmp_path / "runs.jsonl"
    rc = main([
        "--synthetic", "--preset", "test-tiny", "--tokenizer",
        REFERENCE_TOKENIZER, "--max-new-tokens", "6",
        "--stats-json", "--run-log", str(log),
        "Once upon a time",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Once upon a time" in out
    assert "Token count:" in out and "tokens/s" in out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["generated_tokens"] == 6
    assert stats["prefill_ms"] > 0 and stats["decode_tok_s"] > 0
    rec = json.loads(log.read_text().splitlines()[0])
    assert rec["preset"] == "test-tiny"


@needs_real_vocab
def test_cli_debug_log_dir(tmp_path):
    """--debug-log-dir writes the per-op tensor-stats trace to a rotating
    file (reference debug/debug_llama3.py:31-50 sink behavior)."""
    from llama3np_tpu.cli import main

    logdir = tmp_path / "dbg"
    rc = main([
        "--synthetic", "--preset", "test-tiny", "--tokenizer",
        REFERENCE_TOKENIZER, "--max-new-tokens", "2",
        "--debug-log-dir", str(logdir), "hello",
    ])
    assert rc == 0
    files = list(logdir.glob("llama3np_tpu_debug_*.log"))
    assert len(files) == 1
    text = files[0].read_text()
    for checkpoint in ["input_ids", "embedding", "rope_xq", "k_cache",
                       "attn_out", "block_out", "logits"]:
        assert checkpoint in text
    assert "dtype=" in text and "mean=" in text


def test_functional_api_shim(tiny_args, tiny_weights, tmp_path, rng):
    """Root llama3_simple.py exposes the reference functional twin's API and
    count semantics (up to max_new_tokens NEW tokens)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from llama3np_tpu import save_npz
    import llama3_simple as fn

    path = str(tmp_path / "m.npz")
    save_npz(tiny_weights, path)
    model = fn.llama_init(path, tiny_args)
    ids = rng.integers(3, tiny_args.vocab_size, size=(1, 4)).astype(np.int32)
    logits = fn.llama_forward(model, ids, 0)
    assert logits.shape == (1, 1, tiny_args.vocab_size)
    toks = list(fn.llama_generate(model, ids, 7))
    assert len(toks) == 7
    assert all(t.shape == (1, 1) for t in toks)
    # First yielded token == argmax of the prefill logits.
    assert int(toks[0][0, 0]) == int(logits[0, -1].argmax())


def test_timed_generate_matches_generate_tokens(tiny_args, tiny_weights, rng):
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.observability import timed_generate

    eng = Llama(tiny_weights, tiny_args)
    ids = rng.integers(3, tiny_args.vocab_size, size=(1, 4)).astype(np.int32)
    want = np.asarray(eng.generate_tokens(ids, 8))[0].tolist()
    toks, stats = timed_generate(eng, ids, 8)
    assert np.asarray(toks)[0].tolist() == want
    assert stats.prompt_tokens == 4 and stats.generated_tokens == 8


def test_debug_mode_catches_nans(tiny_args, tiny_weights):
    import jax.numpy as jnp
    import pytest as _pytest
    from llama3np_tpu.observability import debug_mode
    import jax

    @jax.jit
    def bad(x):
        return jnp.log(x)  # log(0) -> -inf is fine; log(-1) -> nan

    with debug_mode():
        with _pytest.raises(Exception):
            np.asarray(bad(jnp.array([-1.0])))
    # Config restored afterwards.
    assert not jax.config.jax_debug_nans


def test_debug_trace_forward(tiny_args, tiny_weights, rng):
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.observability import debug_trace_forward

    eng = Llama(tiny_weights, tiny_args)
    ids = rng.integers(3, tiny_args.vocab_size, size=(1, 5)).astype(np.int32)
    lines = []
    logits = debug_trace_forward(eng, ids, 0, emit=lines.append)
    assert logits.shape == (1, 1, tiny_args.vocab_size)
    text = "\n".join(lines)
    for checkpoint in ["input_ids", "embedding", "rope_xq", "k_cache",
                       "attn_out", "block_out", "logits"]:
        assert checkpoint in text
    # Stats lines carry dtype/shape/min/max/mean like the reference trace.
    assert "dtype=" in lines[1] and "mean=" in lines[1]
    # The traced logits must agree with the jitted forward.
    eng2 = Llama(tiny_weights, tiny_args)
    want = eng2(ids, 0)
    np.testing.assert_allclose(logits, want, rtol=2e-4, atol=1e-4)


def test_debug_trace_generate_matches_engine(tmp_path):
    """The per-token eager-replay trace (reference debug-build behavior:
    every op logged for the whole generation) emits a full checkpoint set
    per forward AND reproduces the jitted greedy stream."""
    import numpy as np
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.observability import debug_trace_generate

    args = preset("test-tiny")
    engine = Llama(synthetic_weights(args, seed=4), args)
    ids = np.array([[1, 7, 300, 41]], np.int32)
    n = 4
    lines = []
    toks = debug_trace_generate(engine, ids, n, emit=lines.append)
    engine.reset()
    want = np.asarray(engine.generate_tokens(ids, n))
    assert toks.tolist() == want.tolist()
    text = "\n".join(lines)
    # One prefill header + n-1 decode headers; per-forward checkpoints.
    assert text.count("=== prefill") == 1
    assert text.count("=== decode token") == n - 1
    assert text.count("logits:") == n
    assert text.count("rope_xq:") == n


@needs_real_vocab
def test_cli_debug_tokens_flag(tmp_path):
    from llama3np_tpu.cli import main

    logdir = tmp_path / "dbg"
    rc = main(["--synthetic", "--preset", "test-tiny",
               "--tokenizer", REFERENCE_TOKENIZER, "--max-new-tokens", "2",
               "--debug-log-dir", str(logdir),
               "--debug-tokens", "3", "--no-stream", "hi"])
    assert rc == 0
    files = list(logdir.glob("llama3np_tpu_debug_*.log"))
    assert files
    content = files[0].read_text()
    assert content.count("=== decode token") == 2
    assert content.count("logits:") == 3
