"""Multi-LoRA serving: per-request adapters over the continuous-batching
engine (serving.BatchEngine adapters=[...]).

Correctness oracle: a request served with adapter i must reproduce the
greedy stream of a SOLO engine built on merge_lora(base, adapter_i) — the
merged weights and the served x@W + s(x@A)@B low-rank path compute the
same math (f32, associativity-level differences only).  Co-tenants with
different adapters must stay isolated in one ragged step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.checkpoint import build_param_tree
from llama3np_tpu.lora import init_lora, merge_lora
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine


def make_adapter(args, seed, rank=4):
    """Adapter with NON-zero B factors (init_lora's B=0 would make the
    adapted model identical to the base — useless for isolation tests)."""
    lora = init_lora(args, rank=rank, alpha=8.0, seed=seed,
                     targets=("wq", "wv", "w_gate", "w_down"))
    key = jax.random.PRNGKey(seed + 100)
    ly = dict(lora["layers"])
    for name in list(ly):
        if name.endswith("_b"):
            key, sub = jax.random.split(key)
            ly[name] = 0.05 * jax.random.normal(sub, ly[name].shape,
                                                ly[name].dtype)
    return {**lora, "layers": ly}


@pytest.fixture(scope="module")
def ml_setup():
    args = preset("test-tiny", fuse_matmuls=False, dtype="float32")
    weights = synthetic_weights(args, seed=7)
    adapters = [make_adapter(args, seed=1), make_adapter(args, seed=2)]
    base = Llama(weights, args)
    # Solo oracles: merge each adapter into the base tree, round-trip to
    # the HF schema, boot fresh engines.
    from llama3np_tpu.checkpoint import param_tree_to_weights
    merged = [
        Llama(param_tree_to_weights(
            merge_lora(build_param_tree(weights, args), ad), args), args)
        for ad in adapters
    ]
    return args, weights, adapters, base, merged


def serve_stream(engine, adapters, prompt, n, adapter):
    be = BatchEngine(engine, capacity=4, paged=True, page_size=8,
                     adapters=adapters)
    req = be.submit(prompt, n, stop_ids=(), adapter=adapter)
    while not req.done:
        be.step(quantum=4)
    return req.generated


def test_adapter_matches_merged_solo(ml_setup):
    args, weights, adapters, base, merged = ml_setup
    prompt = [1, 5, 9, 14]
    for i in (0, 1):
        want = np.asarray(merged[i].generate_tokens([prompt], 10))[0].tolist()
        got = serve_stream(base, adapters, prompt, 10, adapter=i)
        assert got == want, i


def test_no_adapter_matches_base(ml_setup):
    args, weights, adapters, base, merged = ml_setup
    prompt = [1, 5, 9, 14]
    want = np.asarray(base.generate_tokens([prompt], 10))[0].tolist()
    got = serve_stream(base, adapters, prompt, 10, adapter=None)
    assert got == want


def test_mixed_adapters_one_batch_isolated(ml_setup):
    """Three co-tenants — base, adapter 0, adapter 1 — decode in ONE ragged
    step each quantum; every stream must match its solo oracle."""
    args, weights, adapters, base, merged = ml_setup
    be = BatchEngine(base, capacity=4, paged=True, page_size=8,
                     adapters=adapters)
    prompts = [[1, 5, 9, 14], [1, 7, 2], [1, 3, 3, 8, 2]]
    reqs = [be.submit(prompts[0], 10, stop_ids=()),
            be.submit(prompts[1], 10, stop_ids=(), adapter=0),
            be.submit(prompts[2], 10, stop_ids=(), adapter=1)]
    while be.num_active:
        be.step(quantum=4)
    assert reqs[0].generated == np.asarray(
        base.generate_tokens([prompts[0]], 10))[0].tolist()
    assert reqs[1].generated == np.asarray(
        merged[0].generate_tokens([prompts[1]], 10))[0].tolist()
    assert reqs[2].generated == np.asarray(
        merged[1].generate_tokens([prompts[2]], 10))[0].tolist()


def test_slot_reuse_no_adapter_leak(ml_setup):
    """A base request seated in a slot an adapter request just vacated must
    NOT decode through the stale adapter."""
    args, weights, adapters, base, merged = ml_setup
    be = BatchEngine(base, capacity=1, paged=True, page_size=8,
                     adapters=adapters)
    r1 = be.submit([1, 7, 2], 4, stop_ids=(), adapter=1)
    while not r1.done:
        be.step(quantum=2)
    r2 = be.submit([1, 5, 9, 14], 10, stop_ids=())  # same slot, base model
    while not r2.done:
        be.step(quantum=2)
    want = np.asarray(base.generate_tokens([[1, 5, 9, 14]], 10))[0].tolist()
    assert r2.generated == want


def test_chunked_admission_with_adapter(ml_setup):
    args, weights, adapters, base, merged = ml_setup
    prompt = [1] + list(range(3, 30))  # long prompt -> chunked admission
    be = BatchEngine(base, capacity=2, paged=True, page_size=8,
                     admit_chunk=8, adapters=adapters)
    req = be.submit(prompt, 8, stop_ids=(), adapter=0)
    while not req.done:
        be.step(quantum=2)
    want = np.asarray(merged[0].generate_tokens([prompt], 8))[0].tolist()
    assert req.generated == want


def test_validation(ml_setup):
    args, weights, adapters, base, merged = ml_setup
    be = BatchEngine(base, capacity=2, adapters=adapters)
    with pytest.raises(ValueError, match=r"adapter must be in"):
        be.submit([1, 2], 4, adapter=2)
    plain = BatchEngine(base, capacity=2)
    with pytest.raises(ValueError, match="without adapters"):
        plain.submit([1, 2], 4, adapter=0)
    with pytest.raises(ValueError, match="prefix_cache"):
        BatchEngine(base, capacity=2, paged=True, page_size=8,
                    prefix_cache=True, adapters=adapters)
    bad = init_lora(args, rank=2, alpha=4.0)
    with pytest.raises(ValueError, match="rank"):
        BatchEngine(base, capacity=2, adapters=[adapters[0], bad])


def test_sampled_adapter_stream(ml_setup):
    """Sampling composes with adapters (schedule-independent streams)."""
    args, weights, adapters, base, merged = ml_setup
    outs = []
    for _ in range(2):
        be = BatchEngine(base, capacity=2, adapters=adapters,
                         sampling_seed=5)
        r = be.submit([1, 5, 9], 8, stop_ids=(), temperature=0.9, adapter=1)
        while not r.done:
            be.step(quantum=2)
        outs.append(r.generated)
    assert outs[0] == outs[1]


def test_tp_multilora_matches_single_chip(ml_setup):
    """The adapter bank composes with tensor-parallel serving: the bank
    replicates over the mesh (rank-r factors are tiny), GSPMD reshards the
    per-row deltas into the column-sharded projection outputs, and streams
    stay identical to the single-chip multi-LoRA engine."""
    from llama3np_tpu.parallel.sharding import make_mesh

    args, weights, adapters, base, merged = ml_setup
    tp = Llama(weights, args, mesh=make_mesh(dp=1, tp=2))

    def run(engine):
        be = BatchEngine(engine, capacity=3, paged=True, page_size=8,
                         adapters=adapters)
        reqs = [be.submit([1, 5, 9, 14], 8, stop_ids=()),
                be.submit([1, 7, 2], 8, stop_ids=(), adapter=0),
                be.submit([1, 3, 8], 8, stop_ids=(), adapter=1)]
        while be.num_active:
            be.step(quantum=4)
        return [r.generated for r in reqs]

    assert run(base) == run(tp)


def test_adapters_over_int4_base(ml_setup):
    """Adapters compose with a quantized base: deltas add AFTER the
    commuting dequant post-scale, so an int4 base + adapter serves the
    same stream as a solo engine on (fake-quantized base + adapter) — here
    pinned the cheaper way: the int4 bank engine must differ from the int4
    base stream (adapter active) and match itself across runs."""
    args, weights, adapters, base, merged = ml_setup
    import dataclasses
    qargs = dataclasses.replace(args, quant="int4")
    qeng = Llama(weights, qargs)
    prompt = [1, 5, 9, 14]
    base_stream = serve_stream(qeng, adapters, prompt, 10, adapter=None)
    a_stream = serve_stream(qeng, adapters, prompt, 10, adapter=0)
    a_stream2 = serve_stream(qeng, adapters, prompt, 10, adapter=0)
    assert a_stream == a_stream2
    assert a_stream != base_stream  # non-zero B factors must show
