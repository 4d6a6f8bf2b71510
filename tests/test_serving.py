"""Continuous-batching engine tests: ragged decode must reproduce each
request's solo greedy stream regardless of admission order or co-tenants."""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine


@pytest.fixture(scope="module")
def setup():
    args = preset("test-tiny")
    weights = synthetic_weights(args, seed=23)
    return args, weights, Llama(weights, args)


def solo_stream(engine, prompt, n, stop_ids=(1, 2)):
    toks = np.asarray(engine.generate_tokens(
        np.array([prompt], np.int32), n))[0].tolist()
    out = []
    for t in toks:
        if t in stop_ids:
            break
        out.append(t)
    return out


def test_single_request_matches_solo(setup, rng):
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=6).tolist()
    want = solo_stream(engine, prompt, 10)

    be = BatchEngine(engine, capacity=4)
    req = be.submit(prompt, max_new_tokens=10)
    be.run_to_completion()
    assert req.done
    assert req.generated == want


def test_staggered_requests_match_solo(setup, rng):
    args, weights, engine = setup
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 7, 5)]
    wants = [solo_stream(engine, p, 8) for p in prompts]

    be = BatchEngine(engine, capacity=2)  # third request must queue
    r0 = be.submit(prompts[0], 8)
    be.step()
    be.step()
    r1 = be.submit(prompts[1], 8)
    be.step()
    r2 = be.submit(prompts[2], 8)
    be.run_to_completion()
    for req, want in zip([r0, r1, r2], wants):
        assert req.done
        assert req.generated == want, req.request_id


def test_slot_reuse_is_clean(setup, rng):
    """A slot freed by one request must not leak cache state into the next."""
    args, weights, engine = setup
    p1 = rng.integers(3, args.vocab_size, size=5).tolist()
    p2 = rng.integers(3, args.vocab_size, size=5).tolist()
    be = BatchEngine(engine, capacity=1)
    r1 = be.submit(p1, 6)
    r2 = be.submit(p2, 6)  # queued until r1 finishes
    be.run_to_completion()
    assert r1.done and r2.done
    assert r2.generated == solo_stream(engine, p2, 6)


@pytest.mark.parametrize("quantum,paged", [(4, False), (3, True)])
def test_quantum_steps_match_solo(setup, rng, quantum, paged):
    """Multi-token decode quanta must not change any request's stream, even
    with staggered admissions and mid-quantum finishes."""
    args, weights, engine = setup
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 6, 5)]
    wants = [solo_stream(engine, p, 9) for p in prompts]
    kw = dict(paged=True, page_size=8) if paged else {}
    be = BatchEngine(engine, capacity=2, **kw)
    r0 = be.submit(prompts[0], 9)
    be.step(quantum)
    r1 = be.submit(prompts[1], 9)
    be.step(quantum)
    r2 = be.submit(prompts[2], 9)
    for _ in range(40):
        if be.num_active == 0 and not be._queue:
            break
        be.step(quantum)
    for req, want in zip([r0, r1, r2], wants):
        assert req.done and req.generated == want, req.request_id


def test_paged_matches_dense(setup, rng):
    """Paged cache with on-demand page growth reproduces solo streams."""
    args, weights, engine = setup
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 9)]
    wants = [solo_stream(engine, p, 10) for p in prompts]

    be = BatchEngine(engine, capacity=2, paged=True, page_size=8)
    r0 = be.submit(prompts[0], 10)
    be.step()
    r1 = be.submit(prompts[1], 10)
    be.run_to_completion()
    assert r0.generated == wants[0]
    assert r1.generated == wants[1]


def test_paged_page_reuse(setup, rng):
    """Pages freed by finished requests are recycled; a tight pool that fits
    only one active sequence still serves queued requests correctly."""
    args, weights, engine = setup
    p1 = rng.integers(3, args.vocab_size, size=6).tolist()
    p2 = rng.integers(3, args.vocab_size, size=6).tolist()
    # Enough pages for ~one active 16-token sequence at page_size 8.
    be = BatchEngine(engine, capacity=1, paged=True, page_size=8, num_pages=4)
    r1 = be.submit(p1, 8)
    r2 = be.submit(p2, 8)
    be.run_to_completion()
    assert r1.generated == solo_stream(engine, p1, 8)
    assert r2.generated == solo_stream(engine, p2, 8)
    assert be.allocator.available == 3  # all pages returned


def test_paged_pool_exhaustion(setup, rng):
    args, weights, engine = setup
    be = BatchEngine(engine, capacity=2, paged=True, page_size=8, num_pages=2)
    import pytest as _pytest
    with _pytest.raises(MemoryError):
        be.submit(rng.integers(3, args.vocab_size, size=20).tolist(), 8)


def test_mixed_greedy_and_sampled_requests(setup, rng):
    """A sampled request must not perturb a co-tenant greedy request's
    stream; sampled rows stay within the vocab and finish on budget."""
    args, weights, engine = setup
    pg = rng.integers(3, args.vocab_size, size=5).tolist()
    ps = rng.integers(3, args.vocab_size, size=6).tolist()
    want = solo_stream(engine, pg, 8)

    be = BatchEngine(engine, capacity=2, top_k=50)
    r_greedy = be.submit(pg, 8)
    r_sampled = be.submit(ps, 8, temperature=1.0)
    for _ in range(30):
        if be.num_active == 0:
            break
        be.step(quantum=3)
    assert r_greedy.done and r_sampled.done
    assert r_greedy.generated == want
    assert all(0 <= t < args.vocab_size for t in r_sampled.generated)
    assert len(r_sampled.generated) <= 8


def test_sampled_stream_schedule_independent(setup, rng):
    """A sampled request's stream is a pure function of (engine seed,
    request_id, token index): co-tenants, admission order of later requests,
    and quantum size must not perturb it (ADVICE r1 #1)."""
    args, weights, engine = setup
    ps = rng.integers(3, args.vocab_size, size=5).tolist()
    others = [rng.integers(3, args.vocab_size, size=n).tolist()
              for n in (4, 6, 7)]

    # Solo, quantum 1.
    be_a = BatchEngine(engine, capacity=4, top_k=50, sampling_seed=7)
    r_a = be_a.submit(ps, 10, temperature=0.9)
    be_a.run_to_completion()

    # Same request_id (first submit), three co-tenants, quantum 4.
    be_b = BatchEngine(engine, capacity=4, top_k=50, sampling_seed=7)
    r_b = be_b.submit(ps, 10, temperature=0.9)
    for p in others:
        be_b.submit(p, 9, temperature=0.5)
    for _ in range(40):
        if be_b.num_active == 0 and not be_b._queue:
            break
        be_b.step(quantum=4)

    assert r_a.done and r_b.done
    assert r_a.generated == r_b.generated

    # Different engine seed -> different stream (sanity that sampling is live).
    be_c = BatchEngine(engine, capacity=4, top_k=50, sampling_seed=8)
    r_c = be_c.submit(ps, 10, temperature=0.9)
    be_c.run_to_completion()
    assert r_c.generated != r_a.generated


def test_paged_backpressure_tight_pool(setup, rng):
    """Worst-case pages are reserved at admission: with a pool too small for
    two concurrent worst cases, the second request defers (no mid-step
    MemoryError, which previously deadlocked the engine — ADVICE r1 #3)."""
    args, weights, engine = setup
    p1 = rng.integers(3, args.vocab_size, size=6).tolist()
    p2 = rng.integers(3, args.vocab_size, size=6).tolist()
    # Each request worst-cases at 2 pages (6 + 8 tokens, page_size 8); pool
    # has 3 usable pages, so concurrent admission would oversubscribe.
    be = BatchEngine(engine, capacity=2, paged=True, page_size=8, num_pages=4)
    r1 = be.submit(p1, 8)
    r2 = be.submit(p2, 8)
    assert be.num_active == 1 and len(be._queue) == 1  # r2 deferred
    be.run_to_completion()
    assert r1.generated == solo_stream(engine, p1, 8)
    assert r2.generated == solo_stream(engine, p2, 8)
    assert be.allocator.available == 3


def test_max_seq_len_guard(setup):
    args, weights, engine = setup
    be = BatchEngine(engine, capacity=1)
    with pytest.raises(ValueError):
        be.submit(list(range(3, 3 + args.max_seq_len)), 10)


def test_oversized_request_rejected_at_submit_while_busy(setup, rng):
    """Validation fires at submit() even when no slot is free, so a bad
    request can never detonate inside a later step()."""
    args, weights, engine = setup
    be = BatchEngine(engine, capacity=1)
    ok = be.submit(rng.integers(3, args.vocab_size, size=4).tolist(), 6)
    with pytest.raises(ValueError):
        be.submit(list(range(3, 3 + args.max_seq_len)), 10)
    be.run_to_completion()
    assert ok.done and len(ok.generated) == 6


def test_paged_pallas_kernel_matches_solo(rng):
    """End-to-end: the page-streaming Pallas decode kernel (interpret mode on
    CPU via attn_impl="pallas") reproduces solo greedy streams through the
    serving engine, including staggered admission and quanta."""
    args = preset("test-tiny", attn_impl="pallas")
    weights = synthetic_weights(args, seed=23)
    engine = Llama(weights, args)
    assert engine.cfg.paged_kernel == 2  # interpreted on CPU
    prompts = [rng.integers(3, args.vocab_size, size=n).tolist()
               for n in (4, 9)]
    wants = [solo_stream(engine, p, 8) for p in prompts]

    be = BatchEngine(engine, capacity=2, paged=True, page_size=8)
    r0 = be.submit(prompts[0], 8)
    be.step(2)
    r1 = be.submit(prompts[1], 8)
    for _ in range(20):
        if be.num_active == 0 and not be._queue:
            break
        be.step(2)
    assert r0.generated == wants[0]
    assert r1.generated == wants[1]


# ---------------------------------------------------------------------------
# Chunked admission (VERDICT r2 weak #4)
# ---------------------------------------------------------------------------

def test_chunked_admission_stream_identity(setup, rng):
    """Chunked admission must reproduce the unchunked admission's stream
    exactly (same prefill math, chunked through the model's start>0 path)."""
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=40).tolist()
    plain = BatchEngine(engine, capacity=2, paged=True)
    r_plain = plain.submit(prompt, 6)
    plain.run_to_completion()

    chunked = BatchEngine(engine, capacity=2, paged=True, admit_chunk=16)
    r_chunked = chunked.submit(prompt, 6)
    chunked.run_to_completion()
    assert r_chunked.done
    assert r_chunked.generated == r_plain.generated


def test_chunked_admission_co_tenants_progress(setup, rng):
    """A long admission must not stall co-tenants: active streams advance
    between admission chunks, and nobody's stream changes."""
    args, weights, engine = setup
    short = rng.integers(3, args.vocab_size, size=4).tolist()
    long_p = rng.integers(3, args.vocab_size, size=40).tolist()
    want_short = solo_stream(engine, short, 12)

    be = BatchEngine(engine, capacity=2, paged=True, admit_chunk=16)
    r_short = be.submit(short, 12)
    be.step()
    n_before = len(r_short.generated)
    r_long = be.submit(long_p, 4)  # 40-token prompt -> 3 chunks, 2 interleaves
    n_after = len(r_short.generated)
    assert n_after > n_before  # decode progressed during the admission
    be.run_to_completion()
    assert r_short.generated == want_short
    # The long request's stream equals its unchunked solo stream.
    solo = BatchEngine(engine, capacity=1, paged=True)
    r_solo = solo.submit(long_p, 4)
    solo.run_to_completion()
    assert r_long.generated == r_solo.generated


def test_chunked_admission_int8_kv(setup, rng):
    """Chunked admission composes with the int8 KV cache: requantization at
    the scatter is lossless (scales are reconstructed bit-identically), so
    the stream equals the unchunked int8 stream."""
    args, weights, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=40).tolist()
    plain = BatchEngine(engine, capacity=1, paged=True, kv_quant="int8")
    r_plain = plain.submit(prompt, 6)
    plain.run_to_completion()
    chunked = BatchEngine(engine, capacity=1, paged=True, kv_quant="int8",
                          admit_chunk=16)
    r_chunked = chunked.submit(prompt, 6)
    chunked.run_to_completion()
    assert r_chunked.generated == r_plain.generated


def test_admit_chunk_validation(setup):
    args, weights, engine = setup
    with pytest.raises(ValueError, match="requires paged"):
        BatchEngine(engine, paged=False, admit_chunk=16)
    with pytest.raises(ValueError, match="divide max_seq_len"):
        BatchEngine(engine, paged=True, admit_chunk=24)
