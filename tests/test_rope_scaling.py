"""llama3.1 RoPE frequency scaling (ModelArgs.rope_scaling).

The remap itself is checked against the independent transformers
implementation (ROPE_INIT_FUNCTIONS["llama3"]); the engine checks pin the
usual greedy/logit parity vs the NumPy oracle with scaling active, and that
scaling actually changes the stream (i.e. it is wired through, not dropped).
"""

import numpy as np
import pytest

from llama3np_tpu import NumpyLlama, preset, synthetic_weights
from llama3np_tpu.checkpoint import build_param_tree
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.ops.core import rope_tables, scale_rope_inv_freq
from llama3np_tpu.reference_numpy import rope_tables_np

SCALING = dict(factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
               original_max_position_embeddings=64)


def hf_inv_freq(head_dim, theta, scaling, max_pos):
    """transformers' llama3 rope init as the independent oracle."""
    torch = pytest.importorskip("torch")
    from transformers import PretrainedConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = PretrainedConfig()
    cfg.rope_theta = theta
    cfg.head_dim = head_dim
    cfg.hidden_size = head_dim  # unused when head_dim is set; keep valid
    cfg.num_attention_heads = 1
    cfg.max_position_embeddings = max_pos
    cfg.rope_scaling = dict(rope_type="llama3", **scaling)
    inv, att = ROPE_INIT_FUNCTIONS["llama3"](cfg, device="cpu")
    assert att == 1.0
    return np.asarray(inv.to(torch.float64))


@pytest.mark.parametrize("head_dim,theta", [(64, 500000.0), (128, 500000.0),
                                            (48, 10000.0)])
def test_remap_matches_transformers(head_dim, theta):
    exps = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    inv = 1.0 / theta ** exps
    ours = scale_rope_inv_freq(inv, SCALING)
    theirs = hf_inv_freq(head_dim, theta, SCALING, max_pos=512)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_remap_band_structure():
    """High-frequency components untouched, low-frequency divided by the
    factor, band in between strictly intermediate."""
    head_dim = 64
    exps = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    inv = 1.0 / 500000.0 ** exps
    out = scale_rope_inv_freq(inv, SCALING)
    wavelen = 2 * np.pi / inv
    orig = SCALING["original_max_position_embeddings"]
    hi = wavelen < orig / SCALING["high_freq_factor"]
    lo = wavelen > orig / SCALING["low_freq_factor"]
    assert hi.any() and lo.any() and (~hi & ~lo).any()
    np.testing.assert_array_equal(out[hi], inv[hi])
    np.testing.assert_allclose(out[lo], inv[lo] / SCALING["factor"])
    mid = ~hi & ~lo
    assert (out[mid] < inv[mid]).all()
    assert (out[mid] > inv[mid] / SCALING["factor"]).all()


def test_tables_scaled_jax_matches_numpy():
    cj, sj = rope_tables(64, 128, 500000.0, scaling=SCALING)
    cn, sn = rope_tables_np(64, 128, 500000.0, scaling=SCALING)
    np.testing.assert_allclose(np.asarray(cj), cn, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sj), sn, rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def scaled_setup():
    args = preset("test-tiny", rope_scaling=SCALING)
    weights = synthetic_weights(args, seed=3)
    return args, weights


def test_engine_oracle_parity_with_scaling(scaled_setup):
    args, weights = scaled_setup
    engine = Llama(weights, args)
    oracle = NumpyLlama(build_param_tree(weights, args), args)
    ids = np.array([[1, 17, 98, 45]], np.int32)
    got = np.asarray(engine.generate_tokens(ids, 24))[0].tolist()
    oracle.reset_cache()
    want = [int(t) for t in oracle.generate(ids, 24)]
    assert got == want


def test_scaling_changes_logits(scaled_setup):
    """The remap is actually wired through: unscaled and scaled engines
    produce materially different logits on the same weights.  (Greedy
    streams at this toy scale can coincide — random-weight argmax is a
    coarse observable — so the assertion is on logits.)"""
    args, weights = scaled_setup
    scaled = Llama(weights, args)
    plain = Llama(weights, args.replace(rope_scaling=None))
    assert not np.allclose(np.asarray(scaled.cos), np.asarray(plain.cos))
    ids = np.array([[1, 17, 98, 45, 7, 212, 33, 160]], np.int32)
    la = np.asarray(scaled(ids, 0))
    lb = np.asarray(plain(ids, 0))
    assert np.abs(la - lb).max() > 1e-3


def test_presets_carry_scaling():
    for name, factor in [("llama3.1-8b", 8.0), ("llama3.2-1b", 32.0),
                         ("llama3.2-3b", 32.0)]:
        a = preset(name)
        assert a.rope_scaling is not None, name
        assert a.rope_scaling["factor"] == factor
    assert preset("llama3-8b").rope_scaling is None


def test_args_from_hf_config(tmp_path):
    import json

    from llama3np_tpu.checkpoint import args_from_hf_config

    cfg = dict(hidden_size=2048, num_hidden_layers=16,
               num_attention_heads=32, num_key_value_heads=8,
               vocab_size=128256, max_position_embeddings=131072,
               rope_theta=500000.0, rms_norm_eps=1e-5,
               intermediate_size=8192, tie_word_embeddings=True,
               torch_dtype="bfloat16",
               rope_scaling=dict(rope_type="llama3", factor=32.0,
                                 low_freq_factor=1.0, high_freq_factor=4.0,
                                 original_max_position_embeddings=8192))
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    args = args_from_hf_config(str(tmp_path), max_seq_len=8192)
    assert args.dim == 2048 and args.n_kv_heads == 8
    assert args.max_seq_len == 8192  # override wins
    assert args.rope_scaling["factor"] == 32.0
    assert args.dtype == "bfloat16" and args.tie_word_embeddings

    cfg["rope_scaling"] = dict(rope_type="yarn", factor=4.0)
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="yarn"):
        args_from_hf_config(str(tmp_path))
