"""Per-token log-probabilities through the serving engine and HTTP server.

The engine records log_softmax of the raw logits at each emitted token plus
the top-K alternatives (models/llama.py token_logprobs).  The oracle here is
a step-by-step replay with NumpyLlama: its per-position logits, log-softmaxed
in f64 NumPy, must match what the jitted quantum scan recorded.
"""

import numpy as np
import pytest

from llama3np_tpu import NumpyLlama, preset, synthetic_weights
from llama3np_tpu.checkpoint import build_param_tree
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine


@pytest.fixture(scope="module")
def setup():
    args = preset("test-tiny")
    weights = synthetic_weights(args, seed=11)
    return args, weights, Llama(weights, args)


def log_softmax_np(x):
    x = np.asarray(x, np.float64)
    m = x.max(axis=-1, keepdims=True)
    z = x - m
    return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))


def oracle_stream_logprobs(args, weights, prompt, n, k):
    """Replay generation with the NumPy oracle, returning per emitted token
    (token, chosen_lp, [(top id, top lp)] * k)."""
    oracle = NumpyLlama(build_param_tree(weights, args), args)
    oracle.reset_cache()
    ids = np.asarray([prompt], np.int32)
    out, pos = [], 0
    for _ in range(n):
        logits = np.asarray(oracle(ids, pos))[0, -1]
        lps = log_softmax_np(logits)
        tok = int(np.argmax(logits))
        order = np.argsort(-lps, kind="stable")[:k]
        out.append((tok, float(lps[tok]),
                    [(int(i), float(lps[i])) for i in order]))
        pos += ids.shape[1]
        ids = np.asarray([[tok]], np.int32)
    return out


@pytest.mark.parametrize("quantum", [1, 4])
def test_greedy_logprobs_match_oracle(setup, rng, quantum):
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=5).tolist()
    K = 3
    want = oracle_stream_logprobs(args, weights, prompt, 8, K)

    be = BatchEngine(engine, capacity=2, logprobs=K)
    req = be.submit(prompt, max_new_tokens=8, stop_ids=(), logprobs=K)
    while not req.done:
        be.step(quantum=quantum)
    assert req.generated == [t for t, _, _ in want]
    assert len(req.token_logprobs) == len(req.generated)
    got_lps = np.asarray(req.token_logprobs)
    np.testing.assert_allclose(got_lps, [lp for _, lp, _ in want],
                               rtol=2e-4, atol=1e-5)
    for (tok, _, top), got_top in zip(want, req.top_logprobs):
        assert len(got_top) == K
        # Greedy: the chosen token IS the top-1 entry.
        assert got_top[0][0] == tok
        # Same id set (ties can reorder within float noise); values close.
        assert {i for i, _ in got_top} == {i for i, _ in top}
        np.testing.assert_allclose(sorted(v for _, v in got_top),
                                   sorted(v for _, v in top),
                                   rtol=2e-4, atol=1e-5)


def test_logprobs_do_not_change_streams(setup, rng):
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=6).tolist()
    plain = BatchEngine(engine, capacity=2)
    r0 = plain.submit(prompt, max_new_tokens=10, stop_ids=())
    plain.run_to_completion()

    lp = BatchEngine(engine, capacity=2, logprobs=2)
    r1 = lp.submit(prompt, max_new_tokens=10, stop_ids=(), logprobs=2)
    lp.run_to_completion()
    # A co-tenant that did NOT opt in records nothing but decodes identically.
    r2 = lp.submit(prompt, max_new_tokens=10, stop_ids=())
    lp.run_to_completion()
    assert r1.generated == r0.generated == r2.generated
    assert r2.token_logprobs == []
    assert len(r1.token_logprobs) == 10


def test_stop_token_pops_logprob_entries(setup, rng):
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=4).tolist()
    be = BatchEngine(engine, capacity=1, logprobs=1)
    probe = be.submit(prompt, max_new_tokens=6, stop_ids=(), logprobs=0)
    be.run_to_completion()
    stop = probe.generated[2]  # finish mid-stream on the 3rd token

    req = be.submit(prompt, max_new_tokens=6, stop_ids=(stop,), logprobs=0)
    be.run_to_completion()
    assert req.done
    assert stop not in req.generated
    assert len(req.token_logprobs) == len(req.generated)
    assert len(req.top_logprobs) == len(req.generated)


def test_logprobs_with_sampling_and_paged(setup, rng):
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=5).tolist()
    be = BatchEngine(engine, capacity=2, paged=True, page_size=8,
                     top_k=50, logprobs=2)
    req = be.submit(prompt, max_new_tokens=8, stop_ids=(),
                    temperature=0.9, logprobs=2)
    while not req.done:
        be.step(quantum=2)
    assert len(req.token_logprobs) == len(req.generated) == 8
    assert all(lp <= 0.0 for lp in req.token_logprobs)
    for tok, top in zip(req.generated, req.top_logprobs):
        # Sampled token need not be top-1, but the top list is sorted desc.
        assert top[0][1] >= top[1][1]
    # Schedule-independence holds with logprobs on: same seed, solo run.
    be2 = BatchEngine(engine, capacity=2, paged=True, page_size=8,
                      top_k=50, logprobs=2)
    req2 = be2.submit(prompt, max_new_tokens=8, stop_ids=(),
                      temperature=0.9, logprobs=2)
    be2.run_to_completion()
    assert req2.generated == req.generated
    np.testing.assert_allclose(req2.token_logprobs, req.token_logprobs,
                               rtol=2e-4, atol=1e-5)


def test_logprobs_validation(setup):
    args, weights, engine = setup
    plain = BatchEngine(engine, capacity=1)
    with pytest.raises(ValueError, match="without logprobs"):
        plain.submit([1, 2, 3], max_new_tokens=2, logprobs=1)
    with pytest.raises(ValueError, match="logprobs"):
        BatchEngine(engine, capacity=1, logprobs=0)
    be = BatchEngine(engine, capacity=1, logprobs=2)
    with pytest.raises(ValueError, match=r"\[0, 2\]"):
        be.submit([1, 2, 3], max_new_tokens=2, logprobs=5)


def test_server_logprobs(setup):
    import http.client
    import json

    from llama3np_tpu.server import serve

    args, weights, engine = setup
    be = BatchEngine(engine, capacity=2, logprobs=3)
    s = serve(be, tokenizer=None, port=0, quantum=2)
    try:
        host, port = s.server_address
        c = http.client.HTTPConnection(host, port, timeout=300)
        c.request("POST", "/v1/completions",
                  json.dumps({"prompt_ids": [1, 17, 98, 45], "max_tokens": 6,
                              "stop_ids": [], "logprobs": 2}),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        out = json.loads(r.read())
        c.close()
        assert r.status == 200
        ch = out["choices"][0]
        lp = ch["logprobs"]
        assert len(lp["token_logprobs"]) == len(ch["token_ids"]) == 6
        assert all(v <= 0.0 for v in lp["token_logprobs"])
        for tok, top in zip(ch["token_ids"], lp["top_logprobs"]):
            assert len(top) == 2
            assert top[0]["id"] == tok  # greedy: chosen == top-1
    finally:
        s.shutdown()
        s.loop.shutdown()
