"""Training data pipeline: token shards + device-prefetching batch iterator.

New capability beyond the reference (inference-only): the data side of the
training loop.  Design follows the llama2.c/nanoGPT convention — a corpus
is tokenized ONCE into a flat binary shard of token ids, and training reads
fixed-length windows out of it — because that layout is what a TPU input
pipeline wants: zero per-step tokenization, O(1) random access for
shuffling, and batches that are pure `np.ndarray` slices of a memory map
(no Python-object churn on the hot path).

  * `pack_documents` tokenizes an iterable of documents into a .bin shard
    (uint16 when the vocab fits, else uint32), each document BOS-prefixed —
    document boundaries follow the reference tokenizer's conventions.
  * `TokenDataset` memory-maps a shard; `batches()` yields [B, L+1] int32
    windows (inputs and next-token labels come from the same window:
    batch[:, :-1] / batch[:, 1:], matching train.next_token_loss).
  * `prefetch_to_device` keeps N batches in flight with `jax.device_put`
    ahead of consumption, so the host slice/copy overlaps the device step —
    the standard double-buffering that keeps the MXU from idling between
    steps.  With a mesh, batches land pre-sharded over "dp"
    (NamedSharding), so no resharding happens inside the train step.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Optional

import numpy as np

_MAGIC = b"L3TKNS1\x00"  # 8-byte shard header magic + version


def pack_documents(texts: Iterable[str], tokenizer, path: str) -> int:
    """Tokenize documents into a flat .bin token shard; returns the token
    count.  Layout: 8-byte magic, uint32 dtype code (2 or 4 bytes/token),
    then the raw little-endian token stream."""
    ids = []
    for t in texts:
        ids.extend(tokenizer.encode(t, add_bos=True))
    vocab = max(ids, default=0) + 1
    dt = np.uint16 if vocab <= 0x10000 else np.uint32
    arr = np.asarray(ids, dt)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(arr.dtype.itemsize).tobytes())
        f.write(arr.tobytes())
    return arr.size


class TokenDataset:
    """Memory-mapped token shard with windowed batch iteration."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{path}: not a token shard (bad magic)")
            itemsize = int(np.frombuffer(f.read(4), np.uint32)[0])
        dt = {2: np.uint16, 4: np.uint32}[itemsize]
        offset = 12
        n = (os.path.getsize(path) - offset) // itemsize
        self.tokens = np.memmap(path, dt, mode="r", offset=offset, shape=(n,))

    def __len__(self) -> int:
        return self.tokens.shape[0]

    def num_windows(self, seq_len: int) -> int:
        # Each window is seq_len+1 tokens (inputs + shifted labels).
        return max((len(self) - 1) // seq_len, 0)

    def batches(self, batch_size: int, seq_len: int, *, shuffle: bool = True,
                seed: int = 0, epochs: Optional[int] = None,
                drop_last: bool = True) -> Iterator[np.ndarray]:
        """Yield [B, seq_len + 1] int32 windows.  Windows tile the shard at
        stride seq_len (so every token is a label exactly once per epoch);
        shuffle permutes window order per epoch with a per-epoch fold of
        `seed`.  epochs=None streams forever."""
        nw = self.num_windows(seq_len)
        if nw == 0:
            raise ValueError(
                f"shard too small: {len(self)} tokens < seq_len+1")
        if nw < batch_size:
            # Fail loudly: with drop_last=True an epoch would silently yield
            # zero batches (epochs=None would busy-spin forever).
            raise ValueError(
                f"batch_size {batch_size} exceeds {nw} windows per epoch")
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(nw)
            if shuffle:
                np.random.default_rng((seed, epoch)).shuffle(order)
            stops = range(batch_size, nw + 1, batch_size)
            starts = [(s - batch_size, s) for s in stops]
            if not drop_last and nw % batch_size:
                starts.append((nw - nw % batch_size, nw))
            for start, stop in starts:
                idx = order[start:stop]
                batch = np.empty((len(idx), seq_len + 1), np.int32)
                for j, w in enumerate(idx):
                    batch[j] = self.tokens[w * seq_len : w * seq_len
                                           + seq_len + 1]
                yield batch
            epoch += 1


def prefetch_to_device(it: Iterator[np.ndarray], size: int = 2, mesh=None):
    """Wrap a host batch iterator with an N-deep device prefetch queue.

    Each batch is `jax.device_put` as soon as a slot frees (transfers are
    async, so the host→HBM copy of batch k+1 overlaps the device's step on
    batch k).  With `mesh`, batches commit to the ("dp", None) sharding the
    train step expects — placed once, never resharded."""
    import collections

    import jax

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("dp", None))
        put = lambda b: jax.device_put(b, sharding)  # noqa: E731
    else:
        put = jax.device_put
    buf = collections.deque()
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
