"""Tensor-parallel serving: BatchEngine composed with a ("dp", "tp") mesh.

The reference has no serving engine and no parallelism at all (SURVEY §5);
this is the deployment shape for the 70B rung (BASELINE configs[4]): the
paged KV pool shards KV heads over "tp" exactly like the attention weights
(parallel/sharding.serving_cache_pspecs), block tables stay host-side, and
GSPMD propagates the layout through the jitted admission and ragged-decode
programs.  Every test pins stream identity against the single-chip engine —
continuous batching must not change a single token under TP.
"""

import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.parallel.sharding import make_mesh
from llama3np_tpu.serving import BatchEngine


@pytest.fixture(scope="module")
def tp_setup():
    args = preset("test-tiny")  # GQA: kv_heads=2, so tp=2 splits head groups
    w = synthetic_weights(args, seed=7)
    solo = Llama(w, args)
    tp = Llama(w, args, mesh=make_mesh(dp=1, tp=2))
    return args, w, solo, tp


def drain(be, reqs):
    while be.num_active or be._queue:
        be.step(quantum=4)
    return [r.generated for r in reqs]


def mixed_workload(be):
    """Mixed greedy/sampled requests admitted at staggered times."""
    reqs = [be.submit([1, 5, 9, 14], 12),
            be.submit([1, 7], 10, temperature=0.8),
            be.submit([1, 3, 3, 8, 2, 9], 8)]
    be.step(quantum=2)  # partial progress, then a late co-tenant
    reqs.append(be.submit([1, 11, 4], 9, temperature=1.1))
    return drain(be, reqs), reqs


@pytest.mark.parametrize("paged", [False, True])
def test_tp_stream_identity(tp_setup, paged):
    _, _, solo, tp = tp_setup
    a, _ = mixed_workload(BatchEngine(solo, capacity=4, paged=paged,
                                      page_size=8))
    b, _ = mixed_workload(BatchEngine(tp, capacity=4, paged=paged,
                                      page_size=8))
    assert a == b


def test_tp_int8_kv_pool_identity(tp_setup):
    _, _, solo, tp = tp_setup
    a, _ = mixed_workload(BatchEngine(solo, capacity=4, paged=True,
                                      page_size=8, kv_quant="int8"))
    b, _ = mixed_workload(BatchEngine(tp, capacity=4, paged=True,
                                      page_size=8, kv_quant="int8"))
    assert a == b


def test_tp_pool_layout(tp_setup):
    """The pool (values AND int8 scales) must actually shard KV heads over
    "tp" — a replicated pool would silently forfeit the capacity win."""
    _, _, _, tp = tp_setup
    be = BatchEngine(tp, capacity=4, paged=True, page_size=8,
                     kv_quant="int8")
    for name, arr in be.cache.items():
        spec = arr.sharding.spec
        assert spec[2] == "tp", (name, spec)
        assert not arr.sharding.is_fully_replicated, name
    # Layout survives stepping (donation keeps shardings stable; GSPMD may
    # normalize away trailing Nones, so check the KVH axis positionally).
    be.submit([1, 5, 9], 6)
    be.step(quantum=2)
    spec = be.cache["k"].sharding.spec
    assert len(spec) >= 3 and spec[2] == "tp", spec
    assert not be.cache["k"].sharding.is_fully_replicated


def test_tp_int8_weights_serving(tp_setup):
    """int8 weights + int8 KV + paged pool under TP — the full 70B-rung
    feature stack — reproduces the single-chip int8 stream."""
    args, w, _, _ = tp_setup
    qargs = preset("test-tiny", quant="int8")
    solo_q = Llama(w, qargs)
    tp_q = Llama(w, qargs, mesh=make_mesh(dp=1, tp=2))
    a, _ = mixed_workload(BatchEngine(solo_q, capacity=4, paged=True,
                                      page_size=8, kv_quant="int8"))
    b, _ = mixed_workload(BatchEngine(tp_q, capacity=4, paged=True,
                                      page_size=8, kv_quant="int8"))
    assert a == b


def test_tp_chunked_admission_and_prefix_cache(tp_setup):
    """Chunked admission (co-tenant stalls bounded at one chunk) and prefix
    caching (shared-prefix pages gathered, not recomputed) both ride the
    sharded pool."""
    _, _, solo, tp = tp_setup
    common = [1, 4, 6, 2, 9, 3, 5, 7, 8, 10, 12, 11, 13, 14, 15, 16, 17]

    def workload(engine):
        be = BatchEngine(engine, capacity=4, paged=True, page_size=8,
                         admit_chunk=8, prefix_cache=True)
        r1 = be.submit(common + [20, 21], 8)
        drain(be, [r1])
        r2 = be.submit(common + [30], 8)   # hits r1's cached prefix pages
        r3 = be.submit([1, 2] * 12, 6)     # long prompt -> chunked admission
        out = drain(be, [r1, r2, r3])
        return out, be.prefix_stats["hit_tokens"]

    a, hits_a = workload(solo)
    b, hits_b = workload(tp)
    assert a == b
    assert hits_a == hits_b > 0


def test_tp_on_dp_mesh_axis_present(tp_setup):
    """A full ("dp","tp") mesh with dp > 1: the engine's pool replicates over
    the unused "dp" axis (engine replicas are the dp unit) and streams stay
    identical.  Needs max_batch_size divisible by dp — the engine's dense
    generate cache shards batch over "dp" (parallel/sharding.cache_pspecs)."""
    args, w, solo, _ = tp_setup
    eng = Llama(w, preset("test-tiny", max_batch_size=2),
                mesh=make_mesh(dp=2, tp=2))
    a, _ = mixed_workload(BatchEngine(solo, capacity=4, paged=True,
                                      page_size=8))
    b, _ = mixed_workload(BatchEngine(eng, capacity=4, paged=True,
                                      page_size=8))
    assert a == b


def test_tp_cancel_frees_pages(tp_setup):
    _, _, _, tp = tp_setup
    be = BatchEngine(tp, capacity=2, paged=True, page_size=8)
    r1 = be.submit([1, 5, 9], 16)
    r2 = be.submit([1, 7, 2], 16)
    be.step(quantum=2)
    assert be.cancel(r1)
    free_after = be.allocator.available
    drain(be, [r2])
    assert be.allocator.available > free_after  # r2's pages returned too


@pytest.mark.slow
def test_tp_70b_widths_serving_step():
    """llama3-70b real widths (D=8192, KVH=8, vocab 128256) at 2 layers:
    the deployment-shape serving step — int8 weights, int8 paged pool,
    tp=8 — admits and decodes under TP.  Smoke (no single-chip twin: the
    fp32 staging tree at these widths is too slow to build twice on CPU)."""
    args = preset("llama3-70b", n_layers=2, max_seq_len=256,
                  max_batch_size=2, quant="int8")
    w = synthetic_weights(args, seed=0)
    eng = Llama(w, args, mesh=make_mesh(dp=1, tp=8))
    be = BatchEngine(eng, capacity=2, paged=True, page_size=32,
                     kv_quant="int8")
    r1 = be.submit([1, 5, 9, 14, 3], 4)
    r2 = be.submit([1, 7, 2], 4, temperature=0.7)
    out = drain(be, [r1, r2])
    assert len(out[0]) == 4 and len(out[1]) == 4
    assert be.cache["k"].sharding.spec[2] == "tp"
