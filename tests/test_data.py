"""Training data pipeline (llama3np_tpu.data): shard round-trip, window
coverage, shuffling determinism, device prefetch, and an end-to-end LoRA
fine-tune driven from a packed shard."""

import os

import numpy as np
import pytest

from llama3np_tpu.data import (TokenDataset, pack_documents,
                               prefetch_to_device)

TOK_PATH = "/root/reference/tokenizer.model.np"


class _IdTok:
    """Minimal tokenizer stand-in: one 'token' per character code."""

    def encode(self, text, add_bos=True):
        ids = [ord(c) % 500 + 3 for c in text]
        return ([1] + ids) if add_bos else ids


@pytest.fixture()
def shard(tmp_path):
    p = str(tmp_path / "toks.bin")
    n = pack_documents(["hello world", "the quick brown fox", "abc"],
                       _IdTok(), p)
    return p, n


def test_pack_roundtrip(shard):
    p, n = shard
    ds = TokenDataset(p)
    assert len(ds) == n
    # BOS markers appear once per document.
    assert int((np.asarray(ds.tokens) == 1).sum()) == 3
    assert ds.tokens.dtype == np.uint16  # small vocab -> 2 bytes/token


def test_bad_magic(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"not a shard at all")
    with pytest.raises(ValueError, match="bad magic"):
        TokenDataset(p)


def test_window_coverage_and_shuffle(shard):
    p, n = shard
    ds = TokenDataset(p)
    L = 5
    nw = ds.num_windows(L)
    assert nw == (n - 1) // L
    # One epoch, no shuffle: windows tile the stream contiguously.
    batches = list(ds.batches(1, L, shuffle=False, epochs=1))
    assert len(batches) == nw
    flat = np.concatenate([b[0, :-1] for b in batches])
    np.testing.assert_array_equal(flat, np.asarray(ds.tokens[: nw * L]))
    for b in batches:
        assert b.shape == (1, L + 1) and b.dtype == np.int32
    # Shuffle: same windows, different order, deterministic per seed.
    s1 = [b[0].tolist() for b in ds.batches(1, L, seed=7, epochs=1)]
    s2 = [b[0].tolist() for b in ds.batches(1, L, seed=7, epochs=1)]
    s3 = [b[0].tolist() for b in ds.batches(1, L, seed=8, epochs=1)]
    assert s1 == s2
    assert sorted(s1) == sorted(b[0].tolist() for b in batches)
    assert s1 != s3 or len(s1) <= 1


def test_small_shard_fails_loudly(shard):
    """batch_size > windows must raise for BOTH drop_last settings — with
    drop_last=True it used to yield zero batches per epoch, so epochs=None
    busy-spun forever in the caller's next()."""
    p, _ = shard
    ds = TokenDataset(p)
    nw = ds.num_windows(5)
    for drop_last in (True, False):
        with pytest.raises(ValueError, match="exceeds"):
            next(ds.batches(nw + 1, 5, drop_last=drop_last))


def test_drop_last_false_yields_partial_tail(shard):
    p, _ = shard
    ds = TokenDataset(p)
    L = 5
    nw = ds.num_windows(L)
    B = 2
    assert nw % B, "fixture must leave a partial tail for this test"
    full = list(ds.batches(B, L, shuffle=False, epochs=1, drop_last=False))
    dropped = list(ds.batches(B, L, shuffle=False, epochs=1, drop_last=True))
    assert len(full) == len(dropped) + 1
    assert full[-1].shape == (nw % B, L + 1)
    # Every window appears exactly once per epoch.
    flat = np.concatenate([b[:, :-1].reshape(-1) for b in full])
    np.testing.assert_array_equal(flat, np.asarray(ds.tokens[: nw * L]))


def test_epoch_streaming(shard):
    p, _ = shard
    ds = TokenDataset(p)
    two = list(ds.batches(1, 5, epochs=2))
    one = list(ds.batches(1, 5, epochs=1))
    assert len(two) == 2 * len(one)
    it = ds.batches(1, 5, epochs=None)
    for _ in range(3 * len(one)):  # streams past any epoch boundary
        next(it)


def test_prefetch_to_device(shard):
    import jax

    p, _ = shard
    ds = TokenDataset(p)
    host = list(ds.batches(2, 5, shuffle=False, epochs=1))
    dev = list(prefetch_to_device(ds.batches(2, 5, shuffle=False, epochs=1)))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        assert isinstance(d, jax.Array)
        np.testing.assert_array_equal(np.asarray(d), h)


def test_prefetch_sharded_over_mesh(shard):
    from llama3np_tpu.parallel.sharding import make_mesh

    p, _ = shard
    ds = TokenDataset(p)
    mesh = make_mesh(dp=2, tp=1)
    (batch,) = list(prefetch_to_device(
        ds.batches(2, 5, shuffle=False, epochs=1), mesh=mesh))[:1]
    assert not batch.sharding.is_fully_replicated
    np.testing.assert_array_equal(
        np.asarray(batch),
        next(iter(ds.batches(2, 5, shuffle=False, epochs=1))))


def test_end_to_end_lora_finetune_from_shard(tmp_path):
    """The whole training stack: pack text -> dataset -> prefetch -> LoRA
    steps reduce loss on the packed corpus."""
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.checkpoint import build_param_tree
    from llama3np_tpu.lora import init_lora, make_lora_train_step
    from llama3np_tpu.models.llama import StaticConfig
    from llama3np_tpu.ops.core import rope_tables
    from llama3np_tpu.train import init_optimizer

    args = preset("test-tiny")
    cfg = StaticConfig.from_args(args)
    params = build_param_tree(synthetic_weights(args, seed=0), args)
    cos, sin = rope_tables(args.head_dim, args.max_seq_len, args.rope_theta)
    p = str(tmp_path / "corpus.bin")
    pack_documents(["a tale of tiny models " * 8], _IdTok(), p)
    ds = TokenDataset(p)
    lora = init_lora(args, rank=4, seed=3)
    opt, st = init_optimizer(lora["layers"], learning_rate=1e-2)
    step = make_lora_train_step(opt, cfg, lora["alpha"] / lora["rank"])
    ly, losses = lora["layers"], []
    for batch in prefetch_to_device(
            ds.batches(2, 16, seed=0, epochs=None)):
        ly, st, loss = step(ly, st, params, batch, cos, sin)
        losses.append(float(loss))
        if len(losses) >= 10:
            break
    assert losses[-1] < losses[0] - 0.1, losses
