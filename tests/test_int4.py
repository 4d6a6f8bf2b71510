"""int4 weight-only quantization (checkpoint.quantize_param_tree bits=4).

Same lattice strategy as tests/test_quant.py: weights snapped to an exact
(int4 grid x per-channel scale) lattice roundtrip exactly, so the int4
engine computes the same real numbers as the fp32 engine on the snapped
weights (the commuting post-scale) and greedy identity is sharp.  XLA:TPU
stores s4 packed two-per-byte, halving weight streaming vs int8 (measured
in scripts/probe_int4.py / BENCHMARKS.md round 5).
"""

import dataclasses

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp
import ml_dtypes

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.checkpoint import (build_param_tree, quantize_param_tree,
                                     save_quantized_npz)
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.serving import BatchEngine


def grid4_weights(args, seed):
    """Synthetic weights snapped onto the int4 lattice (qmax 7)."""
    w = synthetic_weights(args, seed)
    out = {}
    for k, v in w.items():
        v = np.asarray(v, np.float32)
        if v.ndim != 2:
            out[k] = v
            continue
        s = np.maximum(np.max(np.abs(v), axis=-1, keepdims=True) / 7.0,
                       1e-12)
        out[k] = (np.clip(np.rint(v / s), -7, 7) * s).astype(np.float32)
    return out


def test_int4_quantize_roundtrip_exact():
    args = preset("test-tiny")
    weights = grid4_weights(args, seed=5)
    tree = build_param_tree(weights, args)
    q = quantize_param_tree(tree, bits=4)
    for kind in ("wq", "wo", "w_gate", "w_down"):
        assert q["layers"][kind].dtype == ml_dtypes.int4
        deq = (np.asarray(q["layers"][kind], np.float32)
               * q["layers"][kind + "_scale"])
        assert_allclose(deq, tree["layers"][kind], rtol=0, atol=1e-6)
    deq_head = np.asarray(q["lm_head"], np.float32) * q["lm_head_scale"]
    assert_allclose(deq_head, tree["lm_head"], rtol=0, atol=1e-6)


def test_int4_engine_greedy_identity_on_grid(rng):
    args = preset("test-tiny", attn_impl="xla", fuse_matmuls=False)
    args_q = dataclasses.replace(args, quant="int4")
    weights = grid4_weights(args, seed=5)
    ids = rng.integers(3, args.vocab_size, size=(1, 5)).astype(np.int32)
    eng = Llama(weights, args)
    eng_q = Llama(weights, args_q)
    assert eng_q.params["layers"]["wq"].dtype == jnp.int4
    assert_allclose(eng_q(ids, 0), eng(ids, 0), rtol=2e-4, atol=1e-4)
    eng.reset(), eng_q.reset()
    want = np.asarray(eng.generate_tokens(ids, 10))[0].tolist()
    got = np.asarray(eng_q.generate_tokens(ids, 10))[0].tolist()
    assert got == want


def test_int4_rejects_fused_layout():
    args = preset("test-tiny", quant="int4", fuse_matmuls=True)
    with pytest.raises(ValueError, match="unfused"):
        Llama(synthetic_weights(args, seed=0), args)


def test_int4_memory_quarter():
    args = preset("test-tiny", fuse_matmuls=False)
    tree = build_param_tree(synthetic_weights(args, seed=0), args)
    q = quantize_param_tree(tree, bits=4)
    # ml_dtypes int4 host arrays are one byte per value; the PACKED size
    # (what XLA:TPU allocates for s4) is size/2.
    w32 = sum(v.nbytes for v in [tree["layers"]["wq"], tree["lm_head"]])
    w4 = sum(v.size // 2 for v in [q["layers"]["wq"], q["lm_head"]])
    assert w4 * 7.9 < w32 <= w4 * 8.1


def test_int4_serving_matches_solo(rng):
    """int4 weights + paged int8 KV through the BatchEngine reproduce the
    single-stream int4 greedy tokens."""
    args = preset("test-tiny", attn_impl="xla", fuse_matmuls=False,
                  quant="int4")
    weights = grid4_weights(args, seed=3)
    eng = Llama(weights, args)
    prompt = [1, 5, 9, 14]
    want = np.asarray(eng.generate_tokens([prompt], 8))[0].tolist()
    be = BatchEngine(eng, capacity=2, paged=True, page_size=8,
                     kv_quant="int8")
    req = be.submit(prompt, 8, stop_ids=())
    while not req.done:
        be.step(quantum=4)
    # int8 KV rounding can perturb near-ties; on the int4 grid weights the
    # logit gaps are coarse, so the streams should agree exactly.
    assert req.generated == want


def test_int4_tensor_parallel_matches_single_chip(rng):
    from llama3np_tpu.parallel.sharding import make_mesh

    args = preset("test-tiny", fuse_matmuls=False, quant="int4")
    weights = grid4_weights(args, seed=7)
    ids = rng.integers(3, args.vocab_size, size=(1, 6)).astype(np.int32)
    solo = Llama(weights, args)
    tp = Llama(weights, args, mesh=make_mesh(dp=1, tp=2))
    assert tp.params["layers"]["wq"].dtype == jnp.int4
    assert not tp.params["layers"]["wq"].sharding.is_fully_replicated
    want = np.asarray(solo.generate_tokens(ids, 8)).tolist()
    got = np.asarray(tp.generate_tokens(ids, 8)).tolist()
    assert got == want


def test_int4_checkpoint_roundtrip(rng, tmp_path):
    args = preset("test-tiny", fuse_matmuls=False, quant="int4")
    weights = grid4_weights(args, seed=9)
    eng = Llama(weights, args)
    path = str(tmp_path / "int4.npz")
    host_tree = {k: (v if not isinstance(v, dict)
                     else {kk: np.asarray(vv) for kk, vv in v.items()})
                 for k, v in ((kk, vv) for kk, vv in eng.params.items())}
    save_quantized_npz(host_tree, path)
    booted = Llama.from_quantized(path, args)
    assert booted.params["layers"]["wq"].dtype == jnp.int4
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    want = np.asarray(eng.generate_tokens(ids, 8)).tolist()
    got = np.asarray(booted.generate_tokens(ids, 8)).tolist()
    assert got == want


def test_mixed_bits_head_int8(rng):
    """bits=4 + head_bits=8: layer weights int4, lm_head/embedding int8 —
    the mixed tree that sidesteps backend s4 layout constraints on the 2-D
    leaves (BENCHMARKS round-5 envelope note).  Engine must boot the tree
    and generate deterministically."""
    args = preset("test-tiny", fuse_matmuls=False)
    tree = build_param_tree(grid4_weights(args, seed=5), args)
    q = quantize_param_tree(tree, bits=4, head_bits=8)
    assert q["layers"]["wq"].dtype == ml_dtypes.int4
    assert q["lm_head"].dtype == np.int8
    assert q["tok_embedding"].dtype == np.int8
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mixed.npz")
        save_quantized_npz({k: v for k, v in q.items()}, path,
                           rope_split=False)
        args2 = dataclasses.replace(args, quant="int4")
        booted = Llama.from_quantized(path, args2)
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    a = np.asarray(booted.generate_tokens(ids, 8)).tolist()
    b = np.asarray(booted.generate_tokens(ids, 8)).tolist()
    assert a == b and len(a[0]) == 8
