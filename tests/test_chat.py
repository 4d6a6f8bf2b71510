"""Chat templating (llama3np_tpu.chat), the /v1/chat/completions route, and
request cancellation (BatchEngine.cancel / EngineLoop.cancel)."""

import http.client
import json
import os

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.chat import render_chat, stop_strings, truncate_at_stop
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine
from llama3np_tpu.server import serve

TOK_PATH = "/root/reference/tokenizer.model.np"


# -- templates (pure host code) ----------------------------------------------

def test_plain_template():
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    assert render_chat(msgs, "plain") == "system: be brief\nuser: hi\nassistant:"


def test_llama2_template():
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "u1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "u2"}]
    out = render_chat(msgs, "llama2")
    assert out == ("[INST] <<SYS>>\nS\n<</SYS>>\n\nu1 [/INST] a1 "
                   "[INST] u2 [/INST]")


def test_chatml_template():
    out = render_chat([{"role": "user", "content": "hi"}], "chatml")
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"


def test_template_validation():
    with pytest.raises(ValueError, match="non-empty"):
        render_chat([], "plain")
    with pytest.raises(ValueError, match="unknown chat template"):
        render_chat([{"role": "user", "content": "x"}], "nope")
    with pytest.raises(ValueError, match="must be first"):
        render_chat([{"role": "user", "content": "x"},
                     {"role": "system", "content": "s"}], "plain")
    with pytest.raises(ValueError, match="alternating"):
        render_chat([{"role": "user", "content": "a"},
                     {"role": "user", "content": "b"}], "llama2")
    with pytest.raises(ValueError, match="end on a user turn"):
        render_chat([{"role": "user", "content": "a"},
                     {"role": "assistant", "content": "b"}], "llama2")


def test_multi_turn_rendering_is_prefix():
    """The conversation-so-far must render to a string prefix of the same
    conversation extended by the assistant reply + next user turn — the
    property that makes multi-turn chat hit the KV prefix cache."""
    turn1 = [{"role": "user", "content": "hello"}]
    turn2 = turn1 + [{"role": "assistant", "content": "world"},
                     {"role": "user", "content": "again"}]
    for tpl in ("plain", "llama2", "chatml"):
        r1, r2 = render_chat(turn1, tpl), render_chat(turn2, tpl)
        assert r2.startswith(r1), tpl


def test_truncate_at_stop():
    stops = stop_strings("plain")
    assert truncate_at_stop("hi there\nuser: more", stops) == "hi there"
    assert truncate_at_stop("clean", stops) == "clean"
    assert truncate_at_stop("anything", None) == "anything"
    # Earliest stop wins.
    assert truncate_at_stop("a[INST]b", ["[INST]", "b"]) == "a"


# -- engine-level cancel ------------------------------------------------------

ARGS = preset("test-tiny")


@pytest.fixture(scope="module")
def engine():
    return Llama(synthetic_weights(ARGS, seed=0), ARGS)


def test_cancel_active_request(engine):
    be = BatchEngine(engine, capacity=2, paged=True, page_size=16)
    r1 = be.submit([1, 5, 9], max_new_tokens=30, stop_ids=())
    r2 = be.submit([1, 7, 3], max_new_tokens=10, stop_ids=())
    be.step()
    n1 = len(r1.generated)
    assert not r1.done
    held = list(be._pages[r1.slot])
    free_before = be.allocator.available
    assert be.cancel(r1) is True
    assert r1.done and len(r1.generated) == n1
    assert be.allocator.available == free_before + len(held)
    assert be.cancel(r1) is False  # idempotent on finished requests
    # The co-tenant is unaffected and the freed slot re-admits.
    r3 = be.submit([1, 2, 4], max_new_tokens=5, stop_ids=())
    be.run_to_completion()
    assert r2.done and len(r2.generated) == 10
    assert r3.done and len(r3.generated) == 5
    want = np.asarray(
        engine.generate_tokens(np.asarray([[1, 7, 3]], np.int32), 10)
    )[0].tolist()
    assert r2.generated == want


def test_cancel_queued_request(engine):
    be = BatchEngine(engine, capacity=1, paged=True, page_size=16)
    r1 = be.submit([1, 5], max_new_tokens=20, stop_ids=())
    r2 = be.submit([1, 6], max_new_tokens=5, stop_ids=())
    assert r2.slot is None and be._queue  # queued behind capacity
    assert be.cancel(r2) is True
    assert r2.done and not be._queue
    be.run_to_completion()
    assert r1.done and len(r1.generated) == 20


# -- HTTP chat endpoint -------------------------------------------------------

needs_tok = pytest.mark.skipif(not os.path.exists(TOK_PATH),
                               reason="reference tokenizer not present")


@pytest.fixture(scope="module")
def chat_srv():
    if not os.path.exists(TOK_PATH):
        yield None
        return
    from llama3np_tpu import Tokenizer
    args = preset("stories15M", n_layers=2, max_seq_len=128)
    eng = Llama(synthetic_weights(args, seed=0), args)
    be = BatchEngine(eng, capacity=2, paged=True, page_size=16)
    s = serve(be, tokenizer=Tokenizer(TOK_PATH), port=0, quantum=2)
    s._chat_engine = eng  # for greedy-identity checks
    yield s
    s.shutdown()
    s.loop.shutdown()


def _post(s, path, body):
    host, port = s.server_address
    c = http.client.HTTPConnection(host, port, timeout=300)
    c.request("POST", path, json.dumps(body),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    out = json.loads(r.read())
    c.close()
    return r.status, out


@needs_tok
def test_chat_completion_greedy_identity(chat_srv):
    from llama3np_tpu import Tokenizer
    tok = Tokenizer(TOK_PATH)
    msgs = [{"role": "user", "content": "tell me a story"}]
    status, out = _post(chat_srv, "/v1/chat/completions",
                        {"messages": msgs, "max_tokens": 8, "stop": []})
    assert status == 200
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    prompt_ids = tok.encode(render_chat(msgs, "plain"), add_bos=True)
    eng = chat_srv._chat_engine
    want = np.asarray(
        eng.generate_tokens(np.asarray([prompt_ids], np.int32), 8)
    )[0].tolist()
    # No stop strings passed and none in the plain template hit -> content
    # is exactly the decode of the greedy continuation (or a stop-truncated
    # prefix of it if the synthetic weights happened to emit "\nuser:").
    full = tok.decode(want)
    cut = truncate_at_stop(full, stop_strings("plain"))
    assert msg["content"] == cut
    assert out["usage"]["prompt_tokens"] == len(prompt_ids)


@needs_tok
def test_chat_stream_matches_nonstream(chat_srv):
    msgs = [{"role": "user", "content": "tell me a story"}]
    _, want = _post(chat_srv, "/v1/chat/completions",
                    {"messages": msgs, "max_tokens": 8})
    host, port = chat_srv.server_address
    c = http.client.HTTPConnection(host, port, timeout=300)
    c.request("POST", "/v1/chat/completions",
              json.dumps({"messages": msgs, "max_tokens": 8, "stream": True}),
              {"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    body = r.read().decode()
    c.close()
    events = [e[len("data: "):] for e in body.split("\n\n")
              if e.startswith("data: ")]
    assert events[-1] == "[DONE]"
    deltas = [json.loads(e)["choices"][0] for e in events[:-1]]
    assert deltas[0]["delta"].get("role") == "assistant"
    text = "".join(d["delta"].get("content", "") for d in deltas)
    assert text == want["choices"][0]["message"]["content"]
    assert deltas[-1]["finish_reason"] in ("stop", "length")


@needs_tok
def test_chat_stop_string_truncates_and_cancels(chat_srv):
    from llama3np_tpu import Tokenizer
    tok = Tokenizer(TOK_PATH)
    msgs = [{"role": "user", "content": "tell me a story"}]
    # Learn the untruncated text, then replay with a stop string cut from
    # its middle: the response must end right before it.
    _, full = _post(chat_srv, "/v1/chat/completions",
                    {"messages": msgs, "max_tokens": 10})
    text = full["choices"][0]["message"]["content"]
    if len(text) < 8:
        pytest.skip("synthetic stream too short to split")
    stop = text[4:7]
    status, out = _post(chat_srv, "/v1/chat/completions",
                        {"messages": msgs, "max_tokens": 10, "stop": [stop]})
    assert status == 200
    got = out["choices"][0]["message"]["content"]
    assert got == text[:text.index(stop)]
    assert out["choices"][0]["finish_reason"] == "stop"


@needs_tok
def test_chat_error_paths(chat_srv):
    status, out = _post(chat_srv, "/v1/chat/completions", {"messages": []})
    assert status == 400 and "non-empty" in out["error"]
    status, out = _post(chat_srv, "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "x"}],
                         "template": "nope"})
    assert status == 400 and "unknown chat template" in out["error"]


def test_chat_requires_tokenizer(engine):
    be = BatchEngine(engine, capacity=1)
    s = serve(be, tokenizer=None, port=0, quantum=1)
    try:
        status, out = _post(s, "/v1/chat/completions",
                            {"messages": [{"role": "user", "content": "x"}]})
        assert status == 400 and "tokenizer" in out["error"]
    finally:
        s.shutdown()
        s.loop.shutdown()
