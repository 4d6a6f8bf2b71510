"""llama3-70B REAL-dimension validation on the 8-device virtual mesh
(VERDICT r2 missing #2 / next-round #3).

Round-2 TP tests ran at toy widths (dim 128, vocab 512); these run the 70B
config's actual tensor shapes — dim 8192, hidden 28672, vocab 128256,
kv_heads 8, head_dim 128 — at 2 layers over tp=8, exercising the real-width
effects the toys cannot: vocab/8 = 16032-wide lm_head shards (not a
128-lane multiple), 1024-wide head shards, 3584-wide FFN column shards,
streaming sharded load of a multi-GB npz, int8 scale sharding at width,
and (n_layers=2, pp=2) pipeline stage shards.

Costs a few minutes on the single-core CPU backend: one module-scoped
~15 GB fp32 weight set; engines are built per test and freed.  The same
configuration is driver-checked by __graft_entry__.dryrun_multichip
(fifth check).
"""

import gc

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax

from llama3np_tpu import preset
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.parallel import make_mesh

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
    # Real-width engines are minutes of CPU compile each: nightly lane only
    # (the driver's dryrun_multichip 70B check still runs every round).
    pytest.mark.slow,
]


def wide_args(**over):
    return preset("llama3-70b", n_layers=2, max_seq_len=64,
                  max_batch_size=1, dtype="float32", mesh_tp=1,
                  prefill_buckets=(4, 8), **over)


def fast_weights(args, seed=11):
    """synthetic_weights schema, generated directly in f32 (the f64-then-cast
    helper doubles generation time at 3.8B parameters)."""
    rng = np.random.default_rng(seed)
    d, fd, vs = args.dim, args.hidden_dim, args.vocab_size
    kvd = args.kv_heads * args.head_dim

    def w(*shape):
        return rng.standard_normal(shape, dtype=np.float32) * 0.02

    out = {
        "model.embed_tokens.weight": w(vs, d),
        "model.norm.weight": np.ones(d, np.float32) + w(d),
        "lm_head.weight": w(vs, d),
    }
    for i in range(args.n_layers):
        p = f"model.layers.{i}"
        out[f"{p}.self_attn.q_proj.weight"] = w(d, d)
        out[f"{p}.self_attn.k_proj.weight"] = w(kvd, d)
        out[f"{p}.self_attn.v_proj.weight"] = w(kvd, d)
        out[f"{p}.self_attn.o_proj.weight"] = w(d, d)
        out[f"{p}.mlp.gate_proj.weight"] = w(fd, d)
        out[f"{p}.mlp.up_proj.weight"] = w(fd, d)
        out[f"{p}.mlp.down_proj.weight"] = w(d, fd)
        out[f"{p}.input_layernorm.weight"] = np.ones(d, np.float32) + w(d)
        out[f"{p}.post_attention_layernorm.weight"] = \
            np.ones(d, np.float32) + w(d)
    return out


@pytest.fixture(scope="module")
def wide():
    args = wide_args()
    weights = fast_weights(args)
    yield args, weights
    del weights
    gc.collect()


@pytest.fixture(scope="module")
def solo_ref(wide):
    """Single-device fp32 logits + 2-token greedy stream, shared by the
    TP/PP identity tests."""
    args, weights = wide
    ids = np.array([[1, 17, 4093, 128000]], np.int32)
    engine = Llama(weights, args)
    logits = np.asarray(engine(ids, 0))
    engine.reset()
    toks = np.asarray(engine.generate_tokens(ids, 2))[0].tolist()
    del engine
    gc.collect()
    return ids, logits, toks


def test_tp8_forward_and_generate_identity(wide, solo_ref):
    args, weights = wide
    ids, want_logits, want_toks = solo_ref
    engine = Llama(weights, args, mesh=make_mesh(1, 8))
    # Real-width shard shapes: heads 8192/8, FFN 28672/8, vocab 128256/8
    # (= 16032, NOT a 128-lane multiple — the padding case toys never hit).
    ly = engine.params["layers"]
    assert {s.data.shape for s in ly["wq"].addressable_shards} == \
        {(2, 8192, 1024)}
    assert {s.data.shape for s in ly["w_gate"].addressable_shards} == \
        {(2, 8192, 3584)}
    assert {s.data.shape for s in engine.params["lm_head"].addressable_shards} \
        == {(8192, 16032)}
    got = np.asarray(engine(ids, 0))
    # GSPMD reduction order differs from single-device over an 8192-wide
    # contraction; logits land within the parity envelope scaled for width.
    assert_allclose(got, want_logits, rtol=2e-4, atol=5e-4)
    engine.reset()
    assert np.asarray(engine.generate_tokens(ids, 2))[0].tolist() == want_toks
    del engine
    gc.collect()


def test_streaming_sharded_load_at_width(wide, solo_ref, tmp_path_factory):
    """from_sharded_checkpoint at real 70B widths: per-shard npz reads onto
    the tp=8 mesh; forward parity against the in-memory engine."""
    from llama3np_tpu import save_npz

    args, weights = wide
    ids, want_logits, _ = solo_ref
    path = str(tmp_path_factory.mktemp("w70") / "ckpt.npz")
    save_npz(weights, path)
    engine = Llama.from_sharded_checkpoint(path, args, make_mesh(1, 8))
    got = np.asarray(engine(ids, 0))
    assert_allclose(got, want_logits, rtol=2e-4, atol=5e-4)
    del engine
    gc.collect()


def test_int8_tp8_matches_single_chip_at_width(wide):
    """int8 quantized 70B-width weights: per-channel scales shard with their
    weights at real widths; the tp=8 stream reproduces the single-chip int8
    stream (identical quantized math)."""
    args, weights = wide
    ids = np.array([[1, 9000, 77]], np.int32)
    qargs = args.replace(quant="int8", fuse_matmuls=False)
    solo = Llama(weights, qargs)
    want = np.asarray(solo.generate_tokens(ids, 2))[0].tolist()
    del solo
    gc.collect()
    tp = Llama(weights, qargs, mesh=make_mesh(1, 8))
    sc = tp.params["layers"]["wq_scale"]
    assert {s.data.shape for s in sc.addressable_shards} == {(2, 1, 1024)}
    assert np.asarray(tp.generate_tokens(ids, 2))[0].tolist() == want
    del tp
    gc.collect()


def test_pp2_generate_identity_at_width(wide, solo_ref):
    from llama3np_tpu.parallel.pipeline import PipelinedLlama, make_pp_mesh

    args, weights = wide
    ids, _, want_toks = solo_ref
    engine = PipelinedLlama(weights, args, make_pp_mesh(2))
    ly = engine.params["layers"]
    assert {s.data.shape for s in ly["w_down"].addressable_shards} == \
        {(1, 28672, 8192)}
    got = np.asarray(engine.generate_tokens(ids, 2))[0].tolist()
    assert got == want_toks
    del engine
    gc.collect()
