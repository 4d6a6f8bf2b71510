"""HTTP serving front-end (llama3np_tpu.server).

Boots a real ThreadingHTTPServer on an ephemeral port over a test-tiny
BatchEngine and exercises the API with stdlib http.client: completions
(ids and text), greedy identity vs the engine, streaming chunk framing,
concurrency, error paths, and the health/stats routes.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine
from llama3np_tpu.server import serve

ARGS = preset("test-tiny")


@pytest.fixture(scope="module")
def engine():
    return Llama(synthetic_weights(ARGS, seed=0), ARGS)


@pytest.fixture(scope="module")
def srv(engine):
    # Module-scoped: jit closures live per BatchEngine, so one shared server
    # pays the step/admission compiles once (CPU compiles are tens of
    # seconds; a per-test engine made every HTTP client time out).
    be = BatchEngine(engine, capacity=4, paged=True, page_size=16)
    s = serve(be, tokenizer=None, port=0, quantum=2)
    yield s
    s.shutdown()
    s.loop.shutdown()


def _conn(s):
    host, port = s.server_address
    return http.client.HTTPConnection(host, port, timeout=300)


def _post(s, path, body):
    c = _conn(s)
    c.request("POST", path, json.dumps(body),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    out = json.loads(r.read())
    c.close()
    return r.status, out


def test_completion_ids_greedy_identity(srv, engine):
    prompt = [1, 17, 98, 45]
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 12,
                         "stop_ids": []})
    assert status == 200
    got = out["choices"][0]["token_ids"]
    want = np.asarray(
        engine.generate_tokens(np.asarray([prompt], np.int32), 12)
    )[0].tolist()
    assert got == want
    assert out["usage"] == {"prompt_tokens": 4, "completion_tokens": 12,
                            "total_tokens": 16}
    assert out["choices"][0]["finish_reason"] == "length"


def test_stop_id_finish_reason(srv, engine):
    prompt = [1, 17, 98, 45]
    # Find the first greedy token and use it as a stop id -> empty output.
    first = int(np.asarray(
        engine.generate_tokens(np.asarray([prompt], np.int32), 1))[0][0])
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 8,
                         "stop_ids": [first]})
    assert status == 200
    assert out["choices"][0]["token_ids"] == []
    assert out["choices"][0]["finish_reason"] == "stop"


def test_concurrent_requests_match_solo(srv, engine):
    rng = np.random.default_rng(0)
    prompts = [[1] + rng.integers(3, ARGS.vocab_size, size=3).tolist()
               for _ in range(6)]
    results = [None] * len(prompts)

    def go(i):
        _, out = _post(srv, "/v1/completions",
                       {"prompt_ids": prompts[i], "max_tokens": 10,
                        "stop_ids": []})
        results[i] = out["choices"][0]["token_ids"]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(len(prompts))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert all(r is not None for r in results), "a request never completed"
    for i, p in enumerate(prompts):
        want = np.asarray(
            engine.generate_tokens(np.asarray([p], np.int32), 10)
        )[0].tolist()
        assert results[i] == want, f"request {i}"


def test_streaming_chunks(srv, engine):
    prompt = [1, 17, 98, 45]
    c = _conn(srv)
    c.request("POST", "/v1/completions",
              json.dumps({"prompt_ids": prompt, "max_tokens": 9,
                          "stream": True, "stop_ids": []}),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    events = []
    buf = b""
    while True:
        data = r.read(1)
        if not data:
            break
        buf += data
        while b"\n\n" in buf:
            raw, buf = buf.split(b"\n\n", 1)
            assert raw.startswith(b"data: ")
            events.append(raw[len(b"data: "):].decode())
    c.close()
    assert events[-1] == "[DONE]"
    toks = []
    for e in events[:-1]:
        toks.extend(json.loads(e)["choices"][0]["token_ids"])
    want = np.asarray(
        engine.generate_tokens(np.asarray([prompt], np.int32), 9)
    )[0].tolist()
    assert toks == want
    assert len(events) > 2  # streamed in more than one chunk (quantum=2)


def test_error_paths(srv):
    status, out = _post(srv, "/v1/completions", {"max_tokens": 4})
    assert status == 400 and "prompt" in out["error"]
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": "nope", "max_tokens": 4})
    assert status == 400
    status, out = _post(srv, "/v1/completions",
                        {"prompt": "hi", "max_tokens": 4})
    assert status == 400 and "tokenizer" in out["error"]
    # Over-long request: engine-side validation surfaces as a 400.
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": [1] * 60, "max_tokens": 30})
    assert status == 400 and "max_seq_len" in out["error"]
    status, _ = _post(srv, "/nope", {})
    assert status == 404


def test_health_and_stats(srv):
    c = _conn(srv)
    c.request("GET", "/health")
    r = c.getresponse()
    health = json.loads(r.read())
    assert r.status == 200 and health["status"] == "ok"
    _post(srv, "/v1/completions",
          {"prompt_ids": [1, 5, 9], "max_tokens": 5, "stop_ids": []})
    c.request("GET", "/stats")
    r = c.getresponse()
    stats = json.loads(r.read())
    c.close()
    assert stats["served_requests"] >= 1
    assert stats["served_tokens"] >= 5


def test_n_choices(srv):
    prompt = [1, 9, 33, 7]
    # Greedy n=3: identical choices (deterministic argmax), indices 0..2.
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 6, "n": 3,
                         "stop_ids": []})
    assert status == 200
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    assert (out["choices"][0]["token_ids"] == out["choices"][1]["token_ids"]
            == out["choices"][2]["token_ids"])
    assert out["usage"]["completion_tokens"] == 18
    # Sampled n=3: distinct request ids -> distinct streams (overwhelmingly).
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 8, "n": 3,
                         "temperature": 1.0, "stop_ids": []})
    assert status == 200
    streams = [tuple(c["token_ids"]) for c in out["choices"]]
    assert len(set(streams)) > 1
    # n > 1 with streaming is rejected.
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 4, "n": 2,
                         "stream": True})
    assert status == 400 and "n=1" in out["error"]
    status, out = _post(srv, "/v1/completions",
                        {"prompt_ids": prompt, "max_tokens": 4, "n": 0})
    assert status == 400


def test_metrics_endpoint(srv):
    _post(srv, "/v1/completions",
          {"prompt_ids": [1, 8, 3], "max_tokens": 4, "stop_ids": []})
    c = _conn(srv)
    c.request("GET", "/metrics")
    r = c.getresponse()
    body = r.read().decode()
    c.close()
    assert r.status == 200
    assert r.getheader("Content-Type").startswith("text/plain")
    metrics = {}
    for line in body.splitlines():
        if line and not line.startswith("#"):
            k, v = line.split()
            metrics[k] = float(v)
    assert metrics["llama3np_served_requests_total"] >= 1
    assert metrics["llama3np_served_tokens_total"] >= 4
    assert metrics["llama3np_engine_steps_total"] >= 1
    assert metrics["llama3np_step_seconds_total"] > 0
    assert metrics["llama3np_step_seconds_ema"] > 0
    assert metrics["llama3np_active_requests"] == 0


def test_text_prompt_with_tokenizer(engine, tmp_path):
    import os

    tok_path = "/root/reference/tokenizer.model.np"
    if not os.path.exists(tok_path):
        pytest.skip("reference tokenizer not present")
    from llama3np_tpu import Tokenizer

    # test-tiny vocab (512) is smaller than the real tokenizer's 32000, so
    # encode ids can exceed the embedding; the engine clips via take's default
    # mode on CPU? -> avoid: use a vocab-sized stories15M-shaped engine.
    args = preset("stories15M", n_layers=2, max_seq_len=64)
    eng = Llama(synthetic_weights(args, seed=0), args)
    be = BatchEngine(eng, capacity=2)
    tok = Tokenizer(tok_path)
    s = serve(be, tokenizer=tok, port=0, quantum=2)
    try:
        status, out = _post(s, "/v1/completions",
                            {"prompt": "I have a dream", "max_tokens": 6,
                             "stop_ids": []})
        assert status == 200
        ids = out["choices"][0]["token_ids"]
        assert len(ids) == 6
        assert out["choices"][0]["text"] == tok.decode(ids)
        assert out["usage"]["prompt_tokens"] == len(
            tok.encode("I have a dream", add_bos=True))
    finally:
        s.shutdown()
        s.loop.shutdown()


# -- multi-LoRA routing --------------------------------------------------------

@pytest.fixture(scope="module")
def lora_srv():
    """Server over an adapter bank: requests route by adapter name/index."""
    import jax
    from llama3np_tpu.lora import init_lora

    args = preset("test-tiny", fuse_matmuls=False)
    eng = Llama(synthetic_weights(args, seed=0), args)
    ad = init_lora(args, rank=4, seed=3, targets=("wq", "wv"))
    ly = dict(ad["layers"])
    ly["wq_b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(9),
                                         ly["wq_b"].shape, ly["wq_b"].dtype)
    ad = {**ad, "layers": ly}
    be = BatchEngine(eng, capacity=4, adapters=[ad])
    s = serve(be, tokenizer=None, port=0, quantum=2,
              adapter_names=["tuned"])
    yield s, eng, ad
    s.shutdown()
    s.loop.shutdown()


def test_adapter_route_by_name_and_index(lora_srv):
    s, eng, ad = lora_srv
    body = {"prompt_ids": [1, 5, 9], "max_tokens": 8, "stop_ids": []}
    st, base = _post(s, "/v1/completions", body)
    assert st == 200
    st, by_name = _post(s, "/v1/completions", {**body, "adapter": "tuned"})
    assert st == 200
    st, by_idx = _post(s, "/v1/completions", {**body, "adapter": 0})
    assert st == 200
    assert by_name["choices"][0]["token_ids"] == \
        by_idx["choices"][0]["token_ids"]
    # The adapter has non-zero B factors: its stream must differ from base.
    assert by_name["choices"][0]["token_ids"] != \
        base["choices"][0]["token_ids"]


def test_adapter_route_errors(lora_srv):
    s, _, _ = lora_srv
    body = {"prompt_ids": [1, 5], "max_tokens": 4}
    st, out = _post(s, "/v1/completions", {**body, "adapter": "nope"})
    assert st == 400 and "unknown adapter" in out["error"]
    st, out = _post(s, "/v1/completions", {**body, "adapter": [1]})
    assert st == 400
