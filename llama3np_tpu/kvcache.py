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
               max_seq_len: Optional[int] = None, dtype=None,
               quant: Optional[str] = None) -> Dict:
    """Allocate a zeroed dense KV cache for `args`.

    quant="int8" (the serving engine's kv_quant knob) stores int8 rows plus
    per-(token, kv-head) f32 scales in parallel "k_s"/"v_s" arrays
    [NL, B, KVH, M] — ~2x less cache HBM than bf16 (+1/HD scale overhead).
    """
    B = batch_size or args.max_batch_size
    M = max_seq_len or args.max_seq_len
    kvh, hd, nl = args.kv_heads, args.head_dim, args.n_layers
    if quant == "int8":
        return {
            "k": jnp.zeros((nl, B, kvh, M, hd), jnp.int8),
            "v": jnp.zeros((nl, B, kvh, M, hd), jnp.int8),
            "k_s": jnp.zeros((nl, B, kvh, M), jnp.float32),
            "v_s": jnp.zeros((nl, B, kvh, M), jnp.float32),
        }
    dt = jnp.dtype(dtype or args.kv_dtype)
    return {
        "k": jnp.zeros((nl, B, kvh, M, hd), dt),
        "v": jnp.zeros((nl, B, kvh, M, hd), dt),
    }


def cache_nbytes(args: ModelArgs, batch_size: Optional[int] = None,
                 quant: Optional[str] = None) -> int:
    B = batch_size or args.max_batch_size
    per_row = args.head_dim * jnp.dtype(args.kv_dtype).itemsize
    if quant == "int8":
        per_row = args.head_dim + 4  # int8 values + one f32 scale
    return 2 * args.n_layers * B * args.kv_heads * args.max_seq_len * per_row


# ---------------------------------------------------------------------------
# Paged KV cache (serving path; BASELINE config 4)
# ---------------------------------------------------------------------------

def init_paged_cache(args: ModelArgs, num_pages: int, page_size: int = 16,
                     dtype=None, quant: Optional[str] = None) -> Dict:
    """Paged cache pool: pages are allocated to sequences on demand, so HBM
    holds only the tokens that exist instead of `capacity x max_seq_len`
    dense rows.

        k, v: [n_layers, num_pages, KVH, page_size, HD]

    (KVH before page_size so one (page id, kv head) slice is a contiguous
    [page_size, HD] block — the unit the Pallas paged-attention kernel DMAs.)

    Page 0 is reserved as the null page (block tables point unused entries at
    it; reads from it are always masked off by the per-row length).

    quant="int8": int8 value pools plus per-(token, kv-head) f32 scale pools
    "k_s"/"v_s" [NL, P, KVH, page_size] — the capacity lever for 8K-context
    8B serving (bf16 KV at 8K is ~1.07 GB/sequence; int8 halves it).
    """
    kvh, hd, nl = args.kv_heads, args.head_dim, args.n_layers
    if quant == "int8":
        return {
            "k": jnp.zeros((nl, num_pages, kvh, page_size, hd), jnp.int8),
            "v": jnp.zeros((nl, num_pages, kvh, page_size, hd), jnp.int8),
            "k_s": jnp.zeros((nl, num_pages, kvh, page_size), jnp.float32),
            "v_s": jnp.zeros((nl, num_pages, kvh, page_size), jnp.float32),
        }
    dt = jnp.dtype(dtype or args.kv_dtype)
    return {
        "k": jnp.zeros((nl, num_pages, kvh, page_size, hd), dt),
        "v": jnp.zeros((nl, num_pages, kvh, page_size, hd), dt),
    }


class PageAllocator:
    """Host-side refcounted free-list allocator over the page pool (page 0
    reserved).  Refcounts exist for prefix caching (prefix.py): a page can be
    referenced by several block tables plus the prefix registry at once, and
    returns to the free list only when the last reference drops."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))  # stack; 0 reserved
        self._rc = [0] * num_pages

    def alloc(self, n: int) -> list:
        if n > len(self._free):
            raise MemoryError(
                f"paged KV cache exhausted: need {n} pages, "
                f"{len(self._free)} free of {self.num_pages - 1}"
            )
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._rc[p] = 1
        return pages

    def share(self, pages) -> None:
        """Add a reference to already-allocated pages."""
        for p in pages:
            if p != 0:
                assert self._rc[p] > 0, f"share of free page {p}"
                self._rc[p] += 1

    def free(self, pages) -> None:
        for p in pages:
            if p != 0:
                self._rc[p] -= 1
                assert self._rc[p] >= 0, f"double free of page {p}"
                if self._rc[p] == 0:
                    self._free.append(p)

    def refcount(self, page: int) -> int:
        return self._rc[page]

    @property
    def available(self) -> int:
        return len(self._free)
