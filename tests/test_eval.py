"""Evaluation harness (llama3np_tpu.eval): teacher-forced scoring parity
with the NumPy oracle, padding/batching invariance, and the int8 ppl
envelope."""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.eval import Scorer
from llama3np_tpu.models.llama import Llama

ARGS = preset("test-tiny")


@pytest.fixture(scope="module")
def engine():
    return Llama(synthetic_weights(ARGS, seed=0), ARGS)


def _softmax_lp(logits):
    x = logits - logits.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_scores_match_oracle(engine):
    """lp[t] must equal the oracle's log P(ids[t+1] | ids[:t+1]) — the
    oracle forwards each prefix from scratch (reference math, no padding)."""
    from llama3np_tpu.reference_numpy import NumpyLlama

    seq = [1, 17, 98, 45, 7, 300, 12]
    sc = Scorer(engine, batch_size=2)
    nll, cnt = sc.score([seq])
    assert cnt[0] == len(seq) - 1

    from llama3np_tpu.checkpoint import build_param_tree
    oracle = NumpyLlama(
        build_param_tree(synthetic_weights(ARGS, seed=0), ARGS), ARGS)
    want = 0.0
    for t in range(len(seq) - 1):
        oracle.reset_cache()
        logits = np.asarray(
            oracle(np.asarray([seq[: t + 1]], np.int32), 0), np.float64)
        want -= _softmax_lp(logits)[0, -1, seq[t + 1]] \
            if logits.ndim == 3 else _softmax_lp(logits)[0, seq[t + 1]]
    np.testing.assert_allclose(nll[0], want, rtol=2e-4, atol=1e-4)


def test_padding_and_batching_invariance(engine):
    """A sequence's score must not depend on its co-batched neighbors or on
    how much bucket padding follows it."""
    rng = np.random.default_rng(5)
    seqs = [[1] + rng.integers(3, ARGS.vocab_size, size=n).tolist()
            for n in (4, 9, 21, 30)]
    sc1 = Scorer(engine, batch_size=1)   # each alone in its bucket
    sc4 = Scorer(engine, batch_size=4)   # all together, one padded batch
    nll1, cnt1 = sc1.score(seqs)
    nll4, cnt4 = sc4.score(seqs)
    np.testing.assert_array_equal(cnt1, cnt4)
    np.testing.assert_allclose(nll1, nll4, rtol=1e-5, atol=1e-5)


def test_perplexity_aggregation(engine):
    seqs = [[1, 5, 9, 13], [1, 40, 80]]
    sc = Scorer(engine)
    nll, cnt = sc.score(seqs)
    out = sc.perplexity(seqs)
    assert out["tokens"] == int(cnt.sum()) == 5
    np.testing.assert_allclose(
        out["ppl"], np.exp(nll.sum() / cnt.sum()), rtol=1e-6)
    with pytest.raises(ValueError, match="no scorable"):
        sc.perplexity([[7]])


def test_int8_ppl_envelope(engine):
    """The int8-quantized engine must score within a modest ppl band of the
    fp32 engine — the end-to-end quality metric for quantization."""
    q = Llama(synthetic_weights(ARGS, seed=0),
              preset("test-tiny", quant="int8"))
    rng = np.random.default_rng(9)
    seqs = [[1] + rng.integers(3, ARGS.vocab_size, size=24).tolist()
            for _ in range(4)]
    base = Scorer(engine).perplexity(seqs)
    quant = Scorer(q).perplexity(seqs)
    assert abs(quant["nll_per_token"] - base["nll_per_token"]) < 0.05, (
        base, quant)


def test_cli_smoke(tmp_path, capsys):
    import json

    from llama3np_tpu.eval import main
    import os
    tok = "/root/reference/tokenizer.model.np"
    if not os.path.exists(tok):
        pytest.skip("reference tokenizer not present")
    f = tmp_path / "docs.txt"
    f.write_text("I have a dream\n\nthe quick brown fox\n")
    rc = main([str(f), "--preset", "stories15M", "--synthetic",
               "--tokenizer", tok, "--batch-size", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sequences"] == 2 and out["tokens"] > 0 and out["ppl"] > 0
