"""Prefix caching: page-granular KV reuse across serving requests.

Contract: a request admitted through cached prefix pages must produce the
same stream as a fresh solo run (exact for full-precision pools — the gather
is a bit-exact copy and the suffix prefill is the already-proven chunked
path), shared pages must never be rewritten, and cached pages must evict
LRU under pool pressure so the feature never reduces effective capacity.
"""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.kvcache import PageAllocator
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.prefix import PrefixRegistry
from llama3np_tpu.serving import BatchEngine

PAGE = 8


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


# ---------------------------------------------------------------------------
# Registry unit semantics (host-side, no engine)
# ---------------------------------------------------------------------------


def test_registry_chain_lookup_and_register():
    alloc = PageAllocator(16)
    reg = PrefixRegistry(page_size=4)
    toks = list(range(100, 112))  # 3 full pages
    pages = alloc.alloc(3)
    assert reg.register(toks, pages, alloc) == 3
    assert all(alloc.refcount(p) == 2 for p in pages)

    n, hit = reg.lookup(toks)
    assert (n, hit) == (3, pages)
    # Longest-prefix: diverging third page matches only the first two.
    n, hit = reg.lookup(toks[:8] + [7, 7, 7, 7])
    assert (n, hit) == (2, pages[:2])
    # max_pages cap.
    n, hit = reg.lookup(toks, max_pages=1)
    assert (n, hit) == (1, pages[:1])
    # Partial final page never matches.
    n, hit = reg.lookup(toks[:7])
    assert (n, hit) == (1, pages[:1])

    # Re-registering the same content is idempotent (no new entries).
    dup = alloc.alloc(3)
    assert reg.register(toks, dup, alloc) == 0
    assert all(alloc.refcount(p) == 1 for p in dup)


def test_registry_evicts_leaves_lru_only_when_unreferenced():
    alloc = PageAllocator(16)
    reg = PrefixRegistry(page_size=4)
    a = alloc.alloc(2)
    reg.register(list(range(8)), a, alloc)
    b = alloc.alloc(2)
    reg.register(list(range(50, 58)), b, alloc)
    alloc.free(a)
    alloc.free(b)  # registry now sole owner of all 4 pages
    assert reg.evictable_pages(alloc) == 4

    reg.lookup(list(range(8)))  # bump chain a: b is now LRU
    assert reg.evict(1, alloc) == 1  # must take b's leaf, not a's
    n, _ = reg.lookup(list(range(8)))
    assert n == 2  # chain a intact
    n, _ = reg.lookup(list(range(50, 58)))
    assert n == 1  # b's leaf gone, root remains

    # A page some request still references is not evictable (freeing it
    # would not return memory) — only the unreferenced chain counts.
    alloc.share([a[0], a[1]])  # simulate a live block-table reference
    assert reg.evictable_pages(alloc) == 1  # just b's root
    assert reg.evict(10, alloc) == 1
    assert len(reg) == 2  # chain a survives


def test_registry_parent_becomes_evictable_after_child():
    alloc = PageAllocator(16)
    reg = PrefixRegistry(page_size=4)
    pages = alloc.alloc(3)
    reg.register(list(range(12)), pages, alloc)
    alloc.free(pages)
    # Parent entries are not leaves until their children evict; a single
    # evict(3) walks the chain end-first.
    assert reg.evict(3, alloc) == 3
    assert len(reg) == 0
    assert alloc.available == 15


# ---------------------------------------------------------------------------
# Engine integration
# ---------------------------------------------------------------------------


def make_engine(setup, **kw):
    _, _, engine = setup
    kw.setdefault("capacity", 2)
    kw.setdefault("page_size", PAGE)
    return BatchEngine(engine, paged=True, prefix_cache=True, **kw)


def test_prefix_requires_paged(setup):
    _, _, engine = setup
    with pytest.raises(ValueError):
        BatchEngine(engine, paged=False, prefix_cache=True)


def test_identical_prompt_reuses_pages_and_matches_solo(setup, rng):
    args, _, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=3 * PAGE + 3).tolist()
    want = solo_stream(engine, prompt, 10)

    be = make_engine(setup)
    r1 = be.submit(prompt, max_new_tokens=10, stop_ids=())
    be.run_to_completion()
    assert be.prefix_stats["hits"] == 0
    r2 = be.submit(prompt, max_new_tokens=10, stop_ids=())
    be.run_to_completion()
    stats = be.prefix_stats
    assert stats["hits"] == 1 and stats["hit_tokens"] == 3 * PAGE
    assert r1.generated == want
    assert r2.generated == want


def test_partial_prefix_hit_matches_solo(setup, rng):
    args, _, engine = setup
    head = rng.integers(3, args.vocab_size, size=2 * PAGE).tolist()
    tails = [rng.integers(3, args.vocab_size, size=9).tolist()
             for _ in range(2)]
    be = make_engine(setup)
    reqs = [be.submit(head + t, max_new_tokens=8, stop_ids=()) for t in tails]
    be.run_to_completion()
    assert be.prefix_stats["hits"] == 1  # second request hit the head pages
    for req, t in zip(reqs, tails):
        assert req.generated == solo_stream(engine, head + t, 8)


def test_exact_page_multiple_prompt_leaves_suffix_token(setup, rng):
    """A fully cached prompt still needs one real forward for tok0's logits:
    the hit is capped at (L-1)//page so the last page recomputes."""
    args, _, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=3 * PAGE).tolist()
    be = make_engine(setup)
    r1 = be.submit(prompt, max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    r2 = be.submit(prompt, max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    assert be.prefix_stats["hit_tokens"] == 2 * PAGE  # capped below 3 pages
    want = solo_stream(engine, prompt, 6)
    assert r1.generated == want and r2.generated == want


def test_multi_turn_continuation_reuses_conversation(setup, rng):
    """Turn 2's prompt extends turn 1's prompt+reply: the finished request's
    registered conversation pages cover it."""
    args, _, engine = setup
    p1 = rng.integers(3, args.vocab_size, size=2 * PAGE + 2).tolist()
    be = make_engine(setup)
    r1 = be.submit(p1, max_new_tokens=PAGE, stop_ids=())
    be.run_to_completion()
    conv = p1 + r1.generated
    p2 = conv + rng.integers(3, args.vocab_size, size=5).tolist()
    r2 = be.submit(p2, max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    # At least the full pages of (prompt + all-but-last reply tokens).
    assert be.prefix_stats["hit_tokens"] >= ((len(conv) - 1) // PAGE) * PAGE
    assert r2.generated == solo_stream(engine, p2, 6)


def test_shared_pages_never_rewritten(setup, rng):
    args, _, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=3 * PAGE + 1).tolist()
    be = make_engine(setup)
    be.submit(prompt, max_new_tokens=4, stop_ids=())
    be.run_to_completion()
    n_hit, pages = be._registry.lookup(prompt)
    assert n_hit == 3
    before_k = np.asarray(be.cache["k"][:, pages])
    before_v = np.asarray(be.cache["v"][:, pages])
    be.submit(prompt, max_new_tokens=4, stop_ids=())
    be.run_to_completion()
    np.testing.assert_array_equal(before_k, np.asarray(be.cache["k"][:, pages]))
    np.testing.assert_array_equal(before_v, np.asarray(be.cache["v"][:, pages]))


def test_eviction_under_pool_pressure(setup, rng):
    """Registry-held pages must neither block admission nor leak: a pool
    sized for ~one request keeps serving fresh prompts, evicting stale
    cache entries on demand."""
    args, _, engine = setup
    M = args.max_seq_len
    pages_per_req = M // PAGE  # worst case
    be = make_engine(setup, capacity=1, num_pages=1 + pages_per_req + 2)
    for i in range(4):
        prompt = rng.integers(3, args.vocab_size,
                              size=2 * PAGE + i).tolist()
        r = be.submit(prompt, max_new_tokens=M - len(prompt), stop_ids=())
        be.run_to_completion()
        assert r.done
    assert be.prefix_stats["evictions"] > 0
    # No page leaks: free list + registry-held pages account for the pool.
    assert be.allocator.available + len(be._registry) \
        == be.allocator.num_pages - 1


def test_prefix_with_chunked_admission_and_cotenants(setup, rng):
    """Prefix hits compose with chunked admission: co-tenants keep decoding
    between suffix chunks and every stream stays solo-identical."""
    args, _, engine = setup
    head = rng.integers(3, args.vocab_size, size=2 * PAGE).tolist()
    long_tail = rng.integers(3, args.vocab_size, size=20).tolist()
    be = make_engine(setup, admit_chunk=PAGE)
    r1 = be.submit(head + long_tail[:4], max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    r2 = be.submit(list(head), max_new_tokens=10, stop_ids=())
    r3 = be.submit(head + long_tail, max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    assert r1.generated == solo_stream(engine, head + long_tail[:4], 6)
    assert r2.generated == solo_stream(engine, head, 10)
    assert r3.generated == solo_stream(engine, head + long_tail, 6)
    assert be.prefix_stats["hits"] >= 2


def test_int8_kv_prefix_reuse_is_deterministic(setup, rng):
    """int8 pools: cached admissions attend the dequantized prefix (the same
    values decode attention reconstructs), so repeat cached admissions are
    exactly reproducible; accuracy sits inside the tested int8-KV envelope
    (tests/test_kv_quant.py)."""
    args, _, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=3 * PAGE + 2).tolist()
    be = make_engine(setup, kv_quant="int8")
    be.submit(prompt, max_new_tokens=8, stop_ids=())
    be.run_to_completion()
    r2 = be.submit(prompt, max_new_tokens=8, stop_ids=())
    be.run_to_completion()
    r3 = be.submit(prompt, max_new_tokens=8, stop_ids=())
    be.run_to_completion()
    assert be.prefix_stats["hits"] == 2
    assert r2.generated == r3.generated


def test_sampled_request_with_prefix_hit(setup, rng):
    """Stochastic requests reuse prefixes too; streams stay seed-stable.
    Sampling keys fold (request_id, token index), so the fresh-engine
    comparison replays the same submission order for matching ids."""
    args, _, engine = setup
    prompt = rng.integers(3, args.vocab_size, size=2 * PAGE + 1).tolist()
    be = make_engine(setup)
    be.submit(prompt, max_new_tokens=6, stop_ids=())
    be.run_to_completion()
    r2 = be.submit(prompt, max_new_tokens=6, stop_ids=(), temperature=0.8)
    be.run_to_completion()
    be2 = BatchEngine(engine, capacity=2, paged=True, page_size=PAGE)
    be2.submit(prompt, max_new_tokens=6, stop_ids=())  # aligns request ids
    be2.run_to_completion()
    r_fresh = be2.submit(prompt, max_new_tokens=6, stop_ids=(),
                         temperature=0.8)
    be2.run_to_completion()
    assert be.prefix_stats["hits"] >= 1
    assert r2.generated == r_fresh.generated
