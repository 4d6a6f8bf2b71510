"""Checkpoint loader / converter / synthetic-generator tests."""

import io

import numpy as np
import pytest
from numpy.testing import assert_allclose

from llama3np_tpu import (
    ModelArgs, build_param_tree, load_param_tree, save_npz, synthetic_weights,
    write_synthetic_checkpoint, preset,
)
from llama3np_tpu.checkpoint import convert_llama2c_bin, infer_args_from_weights


def test_param_tree_shapes(tiny_args, tiny_weights):
    p = build_param_tree(tiny_weights, tiny_args)
    a = tiny_args
    kvd = a.kv_heads * a.head_dim
    assert p["tok_embedding"].shape == (a.vocab_size, a.dim)
    assert p["layers"]["wq"].shape == (a.n_layers, a.dim, a.dim)
    assert p["layers"]["wk"].shape == (a.n_layers, a.dim, kvd)
    assert p["layers"]["wo"].shape == (a.n_layers, a.dim, a.dim)
    assert p["layers"]["w_gate"].shape == (a.n_layers, a.dim, a.hidden_dim)
    assert p["layers"]["w_down"].shape == (a.n_layers, a.hidden_dim, a.dim)
    assert p["lm_head"].shape == (a.dim, a.vocab_size)
    # Transposition correctness: wq[i] == q_proj.weight.T
    assert_allclose(
        p["layers"]["wq"][0],
        tiny_weights["model.layers.0.self_attn.q_proj.weight"].T,
    )


def test_npz_roundtrip(tmp_path, tiny_args, tiny_weights):
    path = str(tmp_path / "ckpt.npz")
    save_npz(tiny_weights, path)
    p = load_param_tree(path, tiny_args)
    q = build_param_tree(tiny_weights, tiny_args)
    assert_allclose(p["layers"]["wq"], q["layers"]["wq"])


def test_synthetic_checkpoint_file(tmp_path, tiny_args):
    path = write_synthetic_checkpoint(str(tmp_path / "syn.npz"), tiny_args, seed=3)
    p = load_param_tree(path, tiny_args)
    assert p["norm"].shape == (tiny_args.dim,)


def test_tied_embeddings(tiny_args, tiny_weights):
    w = dict(tiny_weights)
    del w["lm_head.weight"]
    p = build_param_tree(w, tiny_args)
    assert_allclose(p["lm_head"], p["tok_embedding"].T)


def test_infer_args(tiny_args, tiny_weights):
    got = infer_args_from_weights(tiny_weights, base=tiny_args)
    assert got.dim == tiny_args.dim
    assert got.n_layers == tiny_args.n_layers
    assert got.hidden_dim == tiny_args.hidden_dim
    assert got.kv_heads == tiny_args.kv_heads


def _write_llama2c_bin(path, args, weights):
    """Serialize HF-schema weights into the llama2.c v0 legacy layout."""
    a = args
    hd = a.head_dim
    with open(path, "wb") as f:
        np.array(
            [a.dim, a.hidden_dim, a.n_layers, a.n_heads, a.kv_heads,
             -a.vocab_size, a.max_seq_len], np.int32
        ).tofile(f)  # negative vocab => untied classifier
        weights["model.embed_tokens.weight"].astype(np.float32).tofile(f)
        for key in ["input_layernorm"]:
            np.stack([weights[f"model.layers.{i}.{key}.weight"] for i in range(a.n_layers)]).astype(np.float32).tofile(f)
        for key in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            np.stack([weights[f"model.layers.{i}.self_attn.{key}.weight"] for i in range(a.n_layers)]).astype(np.float32).tofile(f)
        np.stack([weights[f"model.layers.{i}.post_attention_layernorm.weight"] for i in range(a.n_layers)]).astype(np.float32).tofile(f)
        for key in ["gate_proj", "down_proj", "up_proj"]:
            np.stack([weights[f"model.layers.{i}.mlp.{key}.weight"] for i in range(a.n_layers)]).astype(np.float32).tofile(f)
        weights["model.norm.weight"].astype(np.float32).tofile(f)
        np.zeros(a.max_seq_len * hd // 2, np.float32).tofile(f)  # legacy rope
        np.zeros(a.max_seq_len * hd // 2, np.float32).tofile(f)
        weights["lm_head.weight"].astype(np.float32).tofile(f)


def test_llama2c_converter(tmp_path, tiny_args, tiny_weights):
    bin_path = str(tmp_path / "model.bin")
    _write_llama2c_bin(bin_path, tiny_args, tiny_weights)
    got, got_args = convert_llama2c_bin(bin_path)
    assert got_args.dim == tiny_args.dim
    assert got_args.n_layers == tiny_args.n_layers
    assert got_args.kv_heads == tiny_args.kv_heads
    assert not got_args.tie_word_embeddings
    for key in tiny_weights:
        assert_allclose(got[key], tiny_weights[key], err_msg=key)


def test_llama2c_tokenizer_converter(tmp_path):
    import struct
    from llama3np_tpu.tokenizer import Tokenizer, convert_llama2c_tokenizer

    tokens = ["<unk>", "<s>", "</s>", "a", "b", "ab", " ", "é"]
    scores = [0.0, 0.0, 0.0, -1.0, -1.5, -2.0, -1.0, -3.0]
    bin_path = tmp_path / "tokenizer.bin"
    with open(bin_path, "wb") as f:
        f.write(struct.pack("<i", max(len(t.encode()) for t in tokens)))
        for tok, score in zip(tokens, scores):
            data = tok.encode("utf-8")
            f.write(struct.pack("<fi", score, len(data)))
            f.write(data)
    out = convert_llama2c_tokenizer(str(bin_path), str(tmp_path / "tok.json"))
    tok = Tokenizer(out)
    assert tok.vocab == tokens
    assert tok.encode("ab", add_bos=False) == [5]
    assert tok.encode("é", add_bos=False) == [7]


def test_llama2c_tokenizer_byte_fallback(tmp_path):
    """Raw byte-fallback tokens (invalid standalone UTF-8) must map to the
    published vocab's latin-1 convention, not U+FFFD duplicates."""
    import struct
    from llama3np_tpu.tokenizer import convert_llama2c_tokenizer
    import json as _json

    entries = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0),
               (b"\x80", -1.0), (b"\xfe", -2.0), ("ok", -3.0)]
    bin_path = tmp_path / "tok.bin"
    with open(bin_path, "wb") as f:
        f.write(struct.pack("<i", 8))
        for tok, score in entries:
            data = tok if isinstance(tok, bytes) else tok.encode()
            f.write(struct.pack("<fi", score, len(data)))
            f.write(data)
    out = convert_llama2c_tokenizer(str(bin_path), str(tmp_path / "t.json"))
    toks = _json.load(open(out))["tokens"]
    assert toks[3] == "\x80" and toks[4] == "\xfe"
    assert len(set(toks)) == len(toks)  # no U+FFFD collapse


def test_hf_converter_undoes_rotate_half(tmp_path, tiny_args, tiny_weights, rng):
    """Converting an HF-layout checkpoint (rotate-half q/k rows) must recover
    the interleaved weights exactly."""
    torch = pytest.importorskip("torch")
    import json as _json
    from llama3np_tpu.checkpoint import convert_hf_model
    from llama3np_tpu.ops.core import rope_split_permutation

    a = tiny_args
    # Build a fake HF export: permute q/k rows to split-halves layout.
    q_perm = rope_split_permutation(a.n_heads, a.head_dim)
    k_perm = rope_split_permutation(a.kv_heads, a.head_dim)
    hf = {}
    for key, w in tiny_weights.items():
        w = np.asarray(w)
        if key.endswith("self_attn.q_proj.weight"):
            w = w[q_perm]
        elif key.endswith("self_attn.k_proj.weight"):
            w = w[k_perm]
        hf[key] = w
    model_dir = tmp_path / "hfmodel"
    model_dir.mkdir()
    torch.save({k: torch.from_numpy(v.copy()) for k, v in hf.items()},
               str(model_dir / "pytorch_model.bin"))
    (model_dir / "config.json").write_text(_json.dumps({
        "num_attention_heads": a.n_heads,
        "num_key_value_heads": a.kv_heads,
        "hidden_size": a.dim,
    }))

    got = convert_hf_model(str(model_dir))
    for key in tiny_weights:
        assert_allclose(got[key], tiny_weights[key], err_msg=key)


def test_generation_resume(tmp_path, tiny_args, tiny_weights, rng):
    """Resume from a saved (cache, pos, last token) must continue the exact
    stream an uninterrupted generation produces."""
    from llama3np_tpu.models.llama import Llama

    eng = Llama(tiny_weights, tiny_args)
    ids = rng.integers(3, tiny_args.vocab_size, size=(1, 4)).astype(np.int32)
    full = np.asarray(eng.generate_tokens(ids, 12))[0].tolist()

    eng2 = Llama(tiny_weights, tiny_args)
    first = np.asarray(eng2.generate_tokens(ids, 6))[0].tolist()
    state = str(tmp_path / "gen_state.npz")
    eng2.save_generation_state(state)

    eng3 = Llama(tiny_weights, tiny_args)
    rest = np.asarray(eng3.resume_generate(state, 6))[0].tolist()
    assert first + rest == full


def test_ffn_hidden_dim_rule():
    # stories15M: 2*4*288/3 = 768 exactly (reference comment llama3.py:98).
    assert ModelArgs(dim=288).hidden_dim == 768
    assert preset("stories110M").hidden_dim == 2048


import pytest as _pytest


@_pytest.mark.parametrize("name", [
    "llama3.2-1b",
    _pytest.param("llama3.2-3b", marks=_pytest.mark.slow),  # ~40s compile
])
def test_llama32_presets_smoke(name, rng):
    """llama3.2 presets: GQA shapes, tied embeddings, and the full pipeline
    on a 2-layer shrunk-vocab variant (synthetic weights, CPU)."""
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama

    full = preset(name)
    assert full.tie_word_embeddings and full.n_kv_heads == 8
    args = preset(name, n_layers=2, vocab_size=1024, max_seq_len=64,
                  dtype="float32", kv_dtype="float32")
    weights = synthetic_weights(args, seed=3)
    weights.pop("lm_head.weight", None)  # tied: loader must fall back
    eng = Llama(weights, args)
    ids = rng.integers(3, args.vocab_size, size=(1, 4)).astype(np.int32)
    toks = np.asarray(eng.generate_tokens(ids, 4))
    assert toks.shape == (1, 4)
    # Tied head: lm_head is the embedding transposed.
    np.testing.assert_array_equal(
        np.asarray(eng.params["lm_head"]).T,
        weights["model.embed_tokens.weight"].astype(np.float32))


def test_param_tree_to_weights_roundtrip(tiny_args, tiny_weights):
    """The train-export path (scripts/train_confident.py): stacked pytree ->
    HF-schema dict -> rebuilt pytree must be bit-identical, and the exported
    dict must carry exactly the reference-schema keys."""
    from llama3np_tpu.checkpoint import (build_param_tree,
                                         param_tree_to_weights,
                                         quantize_param_tree)

    tree = build_param_tree(tiny_weights, tiny_args)
    flat = param_tree_to_weights(tree, tiny_args)
    assert set(flat) == {k for k in tiny_weights}
    rebuilt = build_param_tree(flat, tiny_args)
    for (ka, a), (kb, b) in zip(
            sorted(jax_flatten(tree)), sorted(jax_flatten(rebuilt))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="quantized"):
        param_tree_to_weights(quantize_param_tree(tree), tiny_args)


def jax_flatten(tree):
    import jax
    return [("/".join(str(p) for p in path), leaf) for path, leaf
            in jax.tree_util.tree_flatten_with_path(tree)[0]]
