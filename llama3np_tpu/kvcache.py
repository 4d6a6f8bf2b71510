"""KV cache containers.

The dense cache is a pair of static-shape arrays covering all layers:

    k: [n_layers, B, KVH, M, HD]
    v: [n_layers, B, KVH, M, HD]

Stacking layers lets the model's layer loop be a single `lax.scan` whose xs
carry each layer's cache slice in and whose ys carry the updated slice out —
one compiled program regardless of depth — and lets the fused Pallas decode
kernel walk layers as grid steps with the cache aliased in-place.  Score and
output matmuls contract over HD with M on the major axis, so the per-position
write is a contiguous row update.

The reference equivalent is the per-Attention-instance `cache_k/cache_v`
np.zeros state (reference llama3.py:138-153) — mutable object state there,
an explicit functional carry here (the shape `lax.scan` wants, prefigured by
the functional twin's cache threading, reference llama3_simple.py:185-199).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from .config import ModelArgs


def init_cache(args: ModelArgs, batch_size: Optional[int] = None,
               max_seq_len: Optional[int] = None, dtype=None) -> Dict:
    """Allocate a zeroed dense KV cache for `args`."""
    B = batch_size or args.max_batch_size
    M = max_seq_len or args.max_seq_len
    dt = jnp.dtype(dtype or args.kv_dtype)
    kvh, hd, nl = args.kv_heads, args.head_dim, args.n_layers
    return {
        "k": jnp.zeros((nl, B, kvh, M, hd), dt),
        "v": jnp.zeros((nl, B, kvh, M, hd), dt),
    }


def cache_nbytes(args: ModelArgs, batch_size: Optional[int] = None) -> int:
    B = batch_size or args.max_batch_size
    itemsize = jnp.dtype(args.kv_dtype).itemsize
    return 2 * args.n_layers * B * args.kv_heads * args.head_dim * args.max_seq_len * itemsize
