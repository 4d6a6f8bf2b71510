"""Serving soak: a randomized workload (lengths, budgets, admission times,
quanta) over a tight paged pool must reproduce every request's solo greedy
stream and leak no pages.  Catches allocator/slot/quantum interaction bugs
that scripted scenarios miss."""

import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine

# Heavy compile/soak lane: nightly full suite only (pyproject 'slow').
pytestmark = pytest.mark.slow


def test_randomized_soak():
    rng = np.random.default_rng(1234)
    args = preset("test-tiny", max_seq_len=64)
    weights = synthetic_weights(args, seed=31)
    engine = Llama(weights, args)

    # Expected streams via solo generation.
    def solo(prompt, budget):
        eng = Llama(weights, args)
        toks = np.asarray(eng.generate_tokens(
            np.array([prompt], np.int32), budget))[0].tolist()
        out = []
        for t in toks:
            if t in (1, 2):
                break
            out.append(t)
        return out

    be = BatchEngine(engine, capacity=3, paged=True, page_size=8,
                     num_pages=40)
    pending = []
    for i in range(24):
        L = int(rng.integers(2, 12))
        budget = int(rng.integers(2, 14))
        prompt = rng.integers(3, args.vocab_size, size=L).tolist()
        pending.append((prompt, budget))

    reqs = []
    submitted = 0
    for step in range(600):
        # Random staggered admission.
        while submitted < len(pending) and rng.random() < 0.5:
            p, b = pending[submitted]
            reqs.append(be.submit(p, b))
            submitted += 1
        if be.num_active == 0 and not be._queue and submitted == len(pending):
            break
        quantum = int(rng.integers(1, 5))
        be.step(quantum)
    else:
        raise AssertionError("soak did not drain")

    assert len(reqs) == len(pending)
    for req, (prompt, budget) in zip(reqs, pending):
        assert req.done
        want = solo(prompt, budget)
        assert req.generated == want, (req.request_id, req.generated, want)
    # No page leaks: pool back to full.
    assert be.allocator.available == 39


def test_randomized_soak_tensor_parallel():
    """The randomized soak on a tp=2 mesh: staggered admissions, random
    quanta, slot churn — every stream must match the single-chip solo
    oracle (the TP serving composition under sustained load)."""
    from llama3np_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(77)
    args = preset("test-tiny", max_seq_len=64)
    weights = synthetic_weights(args, seed=31)
    solo_engine = Llama(weights, args)

    def solo(prompt, budget):
        eng = Llama(weights, args)
        toks = np.asarray(eng.generate_tokens(
            np.array([prompt], np.int32), budget))[0].tolist()
        out = []
        for t in toks:
            if t in (1, 2):
                break
            out.append(t)
        return out

    engine = Llama(weights, args, mesh=make_mesh(dp=1, tp=2))
    be = BatchEngine(engine, capacity=3, paged=True, page_size=8,
                     num_pages=40, kv_quant=None)
    pending = []
    for _ in range(16):
        L = int(rng.integers(2, 12))
        budget = int(rng.integers(2, 14))
        pending.append((rng.integers(3, args.vocab_size, size=L).tolist(),
                        budget))
    reqs, submitted = [], 0
    for _ in range(600):
        while submitted < len(pending) and rng.random() < 0.5:
            p, b = pending[submitted]
            reqs.append(be.submit(p, b))
            submitted += 1
        if be.num_active == 0 and not be._queue and submitted == len(pending):
            break
        be.step(int(rng.integers(1, 5)))
    else:
        raise AssertionError("tp soak did not drain")
    for (p, b), req in zip(pending, reqs):
        want = solo(p, b)[:b]
        assert req.generated == want
