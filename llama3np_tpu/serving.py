"""Continuous-batching serving engine.

New capability beyond the reference (whose CLI is strictly batch-1 greedy,
reference llama3.py:324-349): a slot-based engine that admits requests at any
time, decodes one token per step for every active request in a single jitted
ragged step (`forward_ragged_decode` — per-row positions), and retires
finished requests, freeing their slot for the next admission.

Design notes (TPU-first):
  * The batch is a FIXED set of `capacity` slots so every step reuses one
    compiled program — no shape churn, no recompiles as requests come and go.
  * Idle slots still flow through the step (their writes land on their own
    next slot and are overwritten when the slot is re-admitted before any
    read — the same masking/overwrite property the padded prefill relies on).
  * Prefill runs per-request on a single-row cache and is scattered into the
    slot's cache rows; decode is the shared ragged step.
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .generate import _last_logits
from .models.llama import (fold_row_keys, forward_hidden,
                           forward_ragged_decode, ragged_decode_steps,
                           sample_rows, sampled_ragged_decode_steps)


def admission_prefill_dense(params, padded, true_len, slot, cache, cos, sin,
                            cfg, row_dtype=None, lora=None):
    """Prefill one request on a fresh single-row cache and scatter its K/V
    into `slot` of the dense serving cache — one jitted program with the big
    cache donated, so admission updates the pool in place instead of copying
    O(capacity x M) HBM per admission (VERDICT r1 weak #3).

    int8 serving caches ("k_s" present): the prefill row cache stays in the
    activation dtype (`row_dtype`) so prefill attention is full precision;
    rows quantize once at the scatter (ops.quantize_kv_rows).

    Returns (last-position logits [1, VS], updated cache)."""
    nl, _, kvh, M, hd = cache["k"].shape
    quant = "k_s" in cache
    dt = jnp.dtype(row_dtype) if quant else cache["k"].dtype
    row = {"k": jnp.zeros((nl, 1, kvh, M, hd), dt),
           "v": jnp.zeros((nl, 1, kvh, M, hd), dt)}
    h, row = forward_hidden(params, padded, jnp.int32(0), row, cos, sin, cfg,
                            first_chunk=True, lora=lora)
    logits = _last_logits(params, h, true_len, cfg)
    if quant:
        from .ops.core import quantize_kv_rows
        k8, ksr = quantize_kv_rows(row["k"])  # scales [NL, 1, KVH, M]
        v8, vsr = quantize_kv_rows(row["v"])
        cache = {"k": cache["k"].at[:, slot].set(k8[:, 0]),
                 "v": cache["v"].at[:, slot].set(v8[:, 0]),
                 "k_s": cache["k_s"].at[:, slot].set(ksr[:, 0]),
                 "v_s": cache["v_s"].at[:, slot].set(vsr[:, 0])}
    else:
        cache = {"k": cache["k"].at[:, slot].set(row["k"][:, 0]),
                 "v": cache["v"].at[:, slot].set(row["v"][:, 0])}
    return logits[:, -1, :], cache


def scatter_row_paged(row, page_idx, cache):
    """Scatter a request's [NL, 1, KVH, M, HD] row cache into the page pool
    at `page_idx` ([max_pages] int32, unused entries -> null page 0).  int8
    pools ("k_s" present) quantize here — the single write point.

    The page index folds the layer axis in (idx over a [NL*P, ...] view):
    leaving NL as a leading scatter window dim makes XLA:TPU relayout the
    whole pool around the scatter — two pool-sized copies per ADMISSION at
    full-8B shapes (the same layout rule as ops.core._commit_rows_flat)."""
    nl, _, kvh, page, hd = cache["k"].shape
    n_pages = page_idx.shape[0]
    P = cache["k"].shape[1]
    idx = (jnp.arange(nl)[:, None] * P + page_idx[None, :]).reshape(-1)

    def put(pool, c):  # c: [NL, 1, KVH, n*page, *tail] row-cache layout
        tail = pool.shape[4:]
        r = c[:, 0].reshape(nl, kvh, n_pages, page, *tail)
        r = jnp.moveaxis(r, 1, 2)  # [NL, n_pages, KVH, page, *tail]
        return pool.reshape(nl * P, kvh, page, *tail).at[idx].set(
            r.reshape(nl * n_pages, kvh, page, *tail)).reshape(pool.shape)

    if "k_s" in cache:
        from .ops.core import quantize_kv_rows
        k8, ksr = quantize_kv_rows(row["k"])
        v8, vsr = quantize_kv_rows(row["v"])
        return {"k": put(cache["k"], k8), "v": put(cache["v"], v8),
                "k_s": put(cache["k_s"], ksr), "v_s": put(cache["v_s"], vsr)}
    return {"k": put(cache["k"], row["k"]), "v": put(cache["v"], row["v"])}


def admission_prefill_paged(params, padded, true_len, page_idx, cache,
                            cos, sin, cfg, row_dtype=None, lora=None):
    """Paged-mode admission: prefill one request and scatter its K/V rows
    into the page pool at `page_idx`.  One jitted program, pool donated.
    int8 pools quantize at the scatter (see admission_prefill_dense)."""
    nl, _, kvh, page, hd = cache["k"].shape
    quant = "k_s" in cache
    M = page_idx.shape[0] * page  # == max_seq_len by construction
    dt = jnp.dtype(row_dtype) if quant else cache["k"].dtype
    row = {"k": jnp.zeros((nl, 1, kvh, M, hd), dt),
           "v": jnp.zeros((nl, 1, kvh, M, hd), dt)}
    h, row = forward_hidden(params, padded, jnp.int32(0), row, cos, sin, cfg,
                            first_chunk=True, lora=lora)
    logits = _last_logits(params, h, true_len, cfg)
    return logits[:, -1, :], scatter_row_paged(row, page_idx, cache)


def gather_pool_row(cache, idx, row_dtype):
    """Gather pool pages `idx` ([max_pages] int32, 0 = null page) into a
    [NL, 1, KVH, M, HD] row cache in `row_dtype` — the prefix-cache admission
    path (prefix.py): the shared prefix's K/V is copied once from the pool
    (a bytes-bound gather) instead of recomputed (a FLOPs+weights-stream
    prefill).  int8 pools dequantize here; the suffix prefill then attends
    the same dequantized values decode attention would reconstruct via its
    commuting post-scales."""
    nl, _, kvh, page, hd = cache["k"].shape

    def to_row(c):  # [NL, n, KVH, page, HD] -> [NL, 1, KVH, n*page, HD]
        return c.transpose(0, 2, 1, 3, 4).reshape(
            nl, kvh, idx.shape[0] * page, hd)[:, None]

    k = cache["k"][:, idx]
    v = cache["v"][:, idx]
    if "k_s" in cache:
        ks = cache["k_s"][:, idx][..., None]  # [NL, n, KVH, page, 1]
        vs = cache["v_s"][:, idx][..., None]
        k = (k.astype(jnp.float32) * ks).astype(row_dtype)
        v = (v.astype(jnp.float32) * vs).astype(row_dtype)
    else:
        k = k.astype(row_dtype)
        v = v.astype(row_dtype)
    return {"k": to_row(k), "v": to_row(v)}


def prefill_row_chunk(params, chunk_ids, start, chunk_len, row, cos, sin,
                      cfg, first_chunk, lora=None):
    """One chunk of a chunked admission prefill against the request's
    temporary row cache (chunked-admission path, VERDICT r2 weak #4: a long
    admission must not stall co-tenants for a whole-prompt prefill).

    chunk_ids: [1, A] (tail chunks padded); start: absolute position of the
    chunk's first token; chunk_len: real tokens in this chunk.  Returns
    (last-real-position logits [1, VS], updated row) — only the final
    chunk's logits are consumed.  Non-first chunks attend the row-cache
    prefix through the model's chunked-prefill path
    (models/llama.py cache/blockwise attention at start > 0).
    """
    h, row = forward_hidden(params, chunk_ids, start, row, cos, sin, cfg,
                            first_chunk=first_chunk, lora=lora)
    logits = _last_logits(params, h, chunk_len, cfg)
    return logits[:, -1, :], row


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    stop_ids: tuple = (1, 2)  # bos/eos, the reference's stop set (quirk Q6)
    temperature: float = 0.0  # 0 = greedy (the reference behavior)
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    slot: Optional[int] = None
    admitting: bool = False  # mid chunked-admission: slot reserved, no decode
    # Per-token log-probabilities (None = not requested; k >= 1 = record the
    # chosen token's logprob plus the top-k alternatives).  Aligned with
    # `generated` (a popped stop token pops its logprob entries too).
    logprobs: Optional[int] = None
    token_logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[List[tuple]] = dataclasses.field(default_factory=list)
    # Multi-LoRA serving: BANK index (0 = base model; submit(adapter=i)
    # maps to i + 1 — bank slot 0 is the all-zero adapter).
    adapter: int = 0

    @property
    def text_ids(self) -> List[int]:
        return list(self.prompt_ids) + self.generated

    def _record_logprob(self, lp: float, ids, lps) -> None:
        self.token_logprobs.append(float(lp))
        k = self.logprobs or 0
        self.top_logprobs.append(
            [(int(i), float(v)) for i, v in zip(ids[:k], lps[:k])])


class BatchEngine:
    """Continuous batching over a `Llama` engine's params.

    paged=True swaps the dense per-slot cache for a page pool + block tables
    (kvcache.init_paged_cache): HBM holds only pages that exist, so total
    cache memory tracks the sum of live sequence lengths instead of
    `capacity x max_seq_len`.  Pages are allocated at admission and extended
    on demand as a sequence crosses a page boundary.

    prefix_cache=True (paged only) additionally shares KV pages across
    requests with a common prompt prefix and caches finished conversations
    for follow-up turns (prefix.py): admission skips prefill compute for
    every fully-cached page, gathering its K/V from the pool instead.
    Cached pages evict LRU under pool pressure, so the feature never
    reduces effective capacity.
    """

    def __init__(self, engine, capacity: int = 8, paged: bool = False,
                 page_size: int = 16, num_pages: Optional[int] = None,
                 top_k: int = 0, top_p: float = 1.0, sampling_seed: int = 0,
                 kv_quant: Optional[str] = None,
                 admit_chunk: Optional[int] = None,
                 prefix_cache: bool = False,
                 logprobs: Optional[int] = None,
                 adapters: Optional[list] = None):
        self.engine = engine
        self.args = engine.args
        self.cfg = engine.cfg
        self.capacity = capacity
        self.paged = paged
        kv_quant = kv_quant or self.args.kv_quant
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant {kv_quant!r}")
        self.kv_quant = kv_quant
        if admit_chunk is not None:
            # Chunked admission needs the null-page parking property: while a
            # slot is mid-admission, interleaved decode steps write its
            # (garbage) K/V through an all-zero block table into the reserved
            # null page, never into live cache.  The dense layout has no such
            # sink, so long-prompt admissions stay paged-only.
            if not paged:
                raise ValueError("admit_chunk requires paged=True")
            if self.args.max_seq_len % admit_chunk:
                raise ValueError("admit_chunk must divide max_seq_len "
                                 "(chunk starts stay in-bounds)")
        self.admit_chunk = admit_chunk
        if prefix_cache and not paged:
            # Sharing is block-table indirection; the dense layout has none.
            raise ValueError("prefix_cache requires paged=True")
        self._in_admission = False
        # Multi-LoRA serving: a bank of adapters served concurrently —
        # requests pick theirs at submit(adapter=i); co-tenant rows decode
        # through DIFFERENT adapters in the same ragged step (per-row
        # low-rank deltas, models/llama.py gather_lora_rows).
        self.lora_bank = None
        if adapters:
            if self.cfg.fused:
                raise ValueError("multi-LoRA serving needs the unfused "
                                 "split layout (fuse_matmuls=False)")
            if prefix_cache:
                # A prefix's K/V depends on which adapter prefilled it;
                # cross-adapter sharing would serve adapter A's cache to
                # adapter B's request.
                raise ValueError("prefix_cache cannot compose with "
                                 "multi-LoRA serving (adapter-dependent KV)")
            from .lora import stack_adapters
            self.lora_bank = stack_adapters(adapters, self.args,
                                            rope_split=self.cfg.rope_split,
                                            dtype=self.args.dtype)
        self.adapter_ids = np.zeros(capacity, np.int32)
        from .kvcache import init_cache, init_paged_cache, PageAllocator
        if paged:
            if self.args.max_seq_len % page_size:
                raise ValueError("page_size must divide max_seq_len")
            self.page_size = page_size
            self.max_pages = self.args.max_seq_len // page_size
            if num_pages is None:
                num_pages = 1 + capacity * self.max_pages
            self.allocator = PageAllocator(num_pages)
            self.cache = init_paged_cache(self.args, num_pages, page_size,
                                          quant=kv_quant)
            self.block_tables = np.zeros((capacity, self.max_pages), np.int32)
            self._pages: List[List[int]] = [[] for _ in range(capacity)]
            # Reserved-but-unallocated worst-case tail pages per slot.
            self._future_pages = np.zeros(capacity, np.int64)
        else:
            self.cache = init_cache(self.args, capacity, quant=kv_quant)
        if getattr(engine, "mesh", None) is not None:
            # Tensor-parallel serving: the pool (or dense slot cache) shards
            # KV heads over "tp" like the attention weights, block tables
            # stay host-side, and GSPMD propagates the layout through the
            # jitted admission/decode programs (the engine's cfg already
            # pins the pure-XLA paths — Pallas kernels are single-chip).
            from .parallel.sharding import shard_serving_cache
            self.cache = shard_serving_cache(self.cache, engine.mesh)
        from .prefix import PrefixRegistry
        self._registry = PrefixRegistry(page_size) if prefix_cache else None
        self.pos = np.zeros(capacity, np.int32)       # next write position
        self.tokens = np.zeros(capacity, np.int32)    # last token per slot
        # Per-slot sampling temperature (0 = greedy); top_k/top_p are
        # engine-wide static knobs.  Sampled streams are schedule-independent:
        # token j of request r is drawn with
        # fold_in(fold_in(PRNGKey(sampling_seed), r), j) regardless of
        # co-tenants, admission timing, or quantum size.
        self.temps = np.zeros(capacity, np.float32)
        self.rids = np.zeros(capacity, np.int32)        # request id per slot
        self.sample_ctr = np.zeros(capacity, np.int32)  # tokens sampled so far
        self.top_k = top_k
        self.top_p = top_p
        self._base_key = jax.random.PRNGKey(sampling_seed)
        self.slots: List[Optional[Request]] = [None] * capacity
        self._ids = itertools.count()
        self._queue: List[Request] = []
        row_dt = str(jnp.dtype(self.args.dtype)) if kv_quant else None
        self._row_dt = jnp.dtype(self.args.dtype if kv_quant
                                 else self.args.kv_dtype)
        self._admit_dense = jax.jit(
            partial(admission_prefill_dense, cfg=self.cfg, row_dtype=row_dt),
            donate_argnums=(4,))
        self._admit_paged = jax.jit(
            partial(admission_prefill_paged, cfg=self.cfg, row_dtype=row_dt),
            donate_argnums=(4,))
        self._scatter_paged = jax.jit(scatter_row_paged, donate_argnums=(2,))
        self._gather_row = jax.jit(
            partial(gather_pool_row, row_dtype=self._row_dt))
        self._chunk_fns = {}  # (A, first) -> jitted prefill_row_chunk
        self._step = jax.jit(partial(forward_ragged_decode, cfg=self.cfg),
                             donate_argnums=(3,))
        self._sample = jax.jit(partial(self._sample_impl, top_k=top_k,
                                       top_p=top_p))
        self._step_n = {}  # (quantum, sampled) -> jitted multi-step scan
        # Log-probability support: `logprobs` is the ENGINE-static top-K so
        # every step reuses one compiled program regardless of which requests
        # opted in (static shapes, no recompiles); requests record at most
        # their own submit(logprobs=k) <= K entries.
        if logprobs is not None and logprobs < 1:
            raise ValueError("engine logprobs (top-K) must be >= 1")
        self.logprobs_k = logprobs
        if logprobs is not None:
            from .models.llama import token_logprobs
            self._lp_fn = jax.jit(partial(token_logprobs, k=logprobs))

    @staticmethod
    def _sample_impl(logits, base_key, rids, ctrs, temps, top_k, top_p):
        keys = fold_row_keys(base_key, rids, ctrs)
        return sample_rows(logits, keys, temps, top_k, top_p)

    def _step_n_fn(self, n: int, sampled: bool = False):
        key = (n, sampled)
        if key not in self._step_n:
            if sampled:
                fn = partial(sampled_ragged_decode_steps, cfg=self.cfg,
                             num_steps=n, top_k=self.top_k, top_p=self.top_p,
                             num_logprobs=self.logprobs_k)
            else:
                fn = partial(ragged_decode_steps, cfg=self.cfg, num_steps=n,
                             num_logprobs=self.logprobs_k)
            self._step_n[key] = jax.jit(fn, donate_argnums=(3,))
        return self._step_n[key]

    def _sampling_active(self) -> bool:
        return bool((self.temps > 0).any())

    # -- admission -----------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int,
               stop_ids=(1, 2), temperature: float = 0.0,
               logprobs: Optional[int] = None,
               adapter: Optional[int] = None) -> Request:
        if adapter is not None:
            if self.lora_bank is None:
                raise ValueError("engine was built without adapters "
                                 "(BatchEngine(..., adapters=[...]))")
            n = self.lora_bank["layers"][
                next(iter(self.lora_bank["layers"]))].shape[1] - 1
            if not 0 <= adapter < n:
                raise ValueError(f"adapter must be in [0, {n})")
        req = Request(next(self._ids), list(prompt_ids), max_new_tokens,
                      tuple(stop_ids), temperature, logprobs=logprobs,
                      adapter=0 if adapter is None else adapter + 1)
        # Validate at submission: a bad request must fail here, not blow up
        # a later step() when it finally gets admitted from the queue.
        if req.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if logprobs is not None:
            if self.logprobs_k is None:
                raise ValueError(
                    "engine was built without logprobs support "
                    "(BatchEngine(..., logprobs=K))")
            if not 0 <= logprobs <= self.logprobs_k:
                raise ValueError(f"logprobs must be in [0, {self.logprobs_k}]"
                                 f" (the engine's static top-K)")
        if len(req.prompt_ids) + req.max_new_tokens > self.args.max_seq_len:
            raise ValueError(
                f"request exceeds max_seq_len: prompt {len(req.prompt_ids)} "
                f"+ max_new_tokens {req.max_new_tokens} > {self.args.max_seq_len}"
            )
        if self.paged:
            worst_pages = -(-(len(req.prompt_ids) + req.max_new_tokens)
                            // self.page_size)
            if worst_pages > self.allocator.num_pages - 1:
                raise MemoryError(
                    f"request needs up to {worst_pages} pages; pool has "
                    f"{self.allocator.num_pages - 1}"
                )
        self._queue.append(req)
        self._admit()
        return req

    def _worst_case_pages(self, req: Request) -> int:
        return min(-(-(len(req.prompt_ids) + req.max_new_tokens)
                     // self.page_size), self.max_pages)

    def _reservation_fits(self, req: Request) -> bool:
        """Admission-time worst-case page reservation: every active request's
        not-yet-allocated tail pages are counted against the pool, so
        `_ensure_pages` can never hit MemoryError mid-step with no way to
        make progress (ADVICE r1 #3).  Prefix-cached pages held only by the
        registry count as available — they evict on demand (_alloc)."""
        L = len(req.prompt_ids)
        n_needed = min(-(-(L + 1) // self.page_size), self.max_pages)
        worst = self._worst_case_pages(req)
        outstanding = int(sum(self._future_pages))
        avail = self.allocator.available
        if self._registry is not None:
            avail += self._registry.evictable_pages(self.allocator)
        return avail - outstanding >= max(worst, n_needed)

    def _alloc(self, n: int) -> list:
        """Allocate pages, evicting LRU prefix-cache entries when the free
        list alone cannot cover the request (the reservation accounting above
        already counted those evictable pages as available)."""
        if self._registry is not None and self.allocator.available < n:
            self._registry.evict(n - self.allocator.available, self.allocator)
        return self.allocator.alloc(n)

    def _admit(self):
        if self._in_admission:
            return  # interleaved step() during a chunked admission
        for slot in range(self.capacity):
            if not self._queue:
                return
            if self.slots[slot] is not None:
                continue
            if self.paged and not self._reservation_fits(self._queue[0]):
                return  # backpressure: admit again once pages free up
            req = self._queue.pop(0)
            self._prefill_into(slot, req)

    def _adm_lora(self, req: Request):
        """Single-adapter tree for this request's admission prefill
        (None when the engine has no bank — keeps the no-LoRA compiled
        programs unchanged)."""
        if self.lora_bank is None:
            return None
        from .lora import bank_adapter_slice
        return bank_adapter_slice(self.lora_bank, req.adapter)

    def _chunk_fn(self, A: int, first: bool):
        key = (A, first)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = jax.jit(
                partial(prefill_row_chunk, cfg=self.cfg, first_chunk=first),
                donate_argnums=(4,))
        return self._chunk_fns[key]

    def _admit_row(self, slot: int, req: Request, padded, L: int,
                   n_hit: int = 0, shared: Optional[list] = None):
        """Row-cache admission: prefill the prompt in chunks against a
        temporary row cache, then commit it to the page pool in one scatter.
        Serves two features at once:

        * chunked admission (admit_chunk set): a decode step for the
          co-tenant slots interleaves between chunks, so a long admission
          bounds every active stream's stall at one chunk instead of one
          whole prompt (VERDICT r2 weak #4);
        * prefix caching (n_hit > 0): the first `n_hit` pages' K/V is
          gathered from the pool (already computed by an earlier request)
          and only tokens from `n_hit * page_size` on are prefilled.  Shared
          pages enter this slot's block table but are never rewritten —
          decode writes start at pos = L, past them.

        The slot is reserved (req.admitting) with an all-zero block table:
        interleaved decode writes for it land on the null page and its
        logits are discarded, so live state is untouched until the single
        final scatter."""
        eng = self.engine
        page = self.page_size
        start0 = n_hit * page
        shared = list(shared or [])
        n_needed = min(-(-(L + 1) // page), self.max_pages)
        # Share before allocating: _alloc may evict registry leaves, and the
        # just-looked-up prefix pages must not be candidates.
        self.allocator.share(shared)
        try:
            fresh = self._alloc(n_needed - n_hit)
        except MemoryError:
            self.allocator.free(shared)
            raise
        pages = shared + fresh
        self._pages[slot] = pages
        self._future_pages[slot] = self._worst_case_pages(req) - n_needed
        self.block_tables[slot] = 0  # parked
        req.slot = slot
        req.admitting = True
        self.slots[slot] = req  # reserve: queued admissions skip this slot
        self.temps[slot] = 0.0
        self.adapter_ids[slot] = req.adapter
        self.pos[slot] = 0
        nl, _, kvh, _, hd = self.cache["k"].shape
        M = self.max_pages * page
        if n_hit:
            idx = np.zeros(self.max_pages, np.int32)
            idx[:n_hit] = shared
            row = self._gather_row(self.cache, jnp.asarray(idx))
        else:
            row = {"k": jnp.zeros((nl, 1, kvh, M, hd), self._row_dt),
                   "v": jnp.zeros((nl, 1, kvh, M, hd), self._row_dt)}
        base = self.admit_chunk or 512
        interleave = self.admit_chunk is not None
        self._in_admission = True
        try:
            logits0 = None
            start = start0
            while start < L:
                A = min(base, M - start)  # never lets a chunk write past M
                clen = min(A, L - start)
                cids = np.zeros((1, A), np.int32)
                cids[0, :clen] = padded[0, start : start + clen]
                logits0, row = self._chunk_fn(A, start == 0)(
                    eng.params, jnp.asarray(cids), jnp.int32(start),
                    jnp.int32(clen), row, eng.cos, eng.sin,
                    lora=self._adm_lora(req))
                start += clen
                if interleave and start < L and any(
                        r is not None and not r.admitting
                        for r in self.slots):
                    self.step()  # co-tenants advance between chunks
        finally:
            self._in_admission = False
        idx = np.zeros(self.max_pages, np.int32)
        idx[n_hit:n_needed] = fresh  # shared prefix pages are never rewritten
        self.cache = self._scatter_paged(row, jnp.asarray(idx), self.cache)
        self.block_tables[slot, :n_needed] = pages
        req.admitting = False
        return logits0

    def _prefill_into(self, slot: int, req: Request):
        eng = self.engine
        from .generate import pad_prompt
        padded, L = pad_prompt(np.asarray([req.prompt_ids], np.int32),
                               self.args)
        n_hit, shared = 0, []
        if self._registry is not None and L > self.page_size:
            # Cap the hit so at least one suffix token remains: admission
            # must run a real forward to produce tok0's logits.
            n_hit, shared = self._registry.lookup(
                req.prompt_ids, max_pages=(L - 1) // self.page_size)
        if self.paged and (n_hit
                           or (self.admit_chunk and L > self.admit_chunk)):
            logits0 = self._admit_row(slot, req, padded, L, n_hit, shared)
        elif self.paged:
            # Allocate pages covering the prompt plus tok0's upcoming write;
            # the remaining worst-case tail stays reserved (future pages).
            page = self.page_size
            # L + 1 covers tok0's upcoming write; L + budget <= max_seq_len
            # with budget >= 1 (validated at submit) keeps this in range, and
            # the min() guards the cap regardless.
            n_needed = min(-(-(L + 1) // page), self.max_pages)
            pages = self._alloc(n_needed)
            self._pages[slot] = pages
            self._future_pages[slot] = self._worst_case_pages(req) - n_needed
            self.block_tables[slot] = 0
            self.block_tables[slot, :n_needed] = pages
            idx = np.zeros(self.max_pages, np.int32)  # pad -> null page 0
            idx[:n_needed] = pages
            logits0, self.cache = self._admit_paged(
                eng.params, jnp.asarray(padded), jnp.int32(L),
                jnp.asarray(idx), self.cache, eng.cos, eng.sin,
                lora=self._adm_lora(req))
        else:
            logits0, self.cache = self._admit_dense(
                eng.params, jnp.asarray(padded), jnp.int32(L),
                jnp.int32(slot), self.cache, eng.cos, eng.sin,
                lora=self._adm_lora(req))
        if req.temperature > 0:
            tok0 = self._sample(
                logits0, self._base_key,
                jnp.asarray([req.request_id], jnp.int32),
                jnp.asarray([0], jnp.int32),
                jnp.asarray([req.temperature], jnp.float32))
        else:
            tok0 = jnp.argmax(logits0, axis=-1)
        first = int(np.asarray(tok0)[0])
        req.slot = slot
        self.slots[slot] = req
        self.temps[slot] = req.temperature
        self.adapter_ids[slot] = req.adapter
        self.rids[slot] = req.request_id
        self.sample_ctr[slot] = 1  # tok0 consumed token index 0
        req.generated.append(first)
        if req.logprobs is not None:
            l1, i1, v1 = self._lp_fn(logits0, tok0.astype(jnp.int32))
            req._record_logprob(np.asarray(l1)[0], np.asarray(i1)[0],
                                np.asarray(v1)[0])
        self.tokens[slot] = first
        self.pos[slot] = L  # `first`'s own position; written by next step
        if self._registry is not None and self.paged:
            # Cache the prompt's full pages for future admissions (shared
            # prefix entries are recognized and skipped by the registry).
            self._registry.register(req.prompt_ids, self._pages[slot],
                                    self.allocator)
        self._maybe_finish(req, first)

    # -- stepping ------------------------------------------------------------

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slots)

    def _ensure_pages(self, horizon: int = 1):
        """Grow any active row whose writes within the next `horizon` steps
        cross into unallocated pages (writes land at pos .. pos+horizon-1).

        The horizon is capped per request at its remaining token budget —
        quantum tokens past a request's budget are discarded, so allocating
        pages for them could exhaust a tight pool for no benefit."""
        for slot, req in enumerate(self.slots):
            if req is None or req.admitting:
                continue  # parked mid-admission: null-page writes, no growth
            # `remaining` emitted tokens need writes at pos..pos+remaining-1
            # (the in-flight token writes at pos).  Discarded quantum-overrun
            # tokens write through unallocated block-table entries, which
            # point at the reserved null page — harmless by construction.
            remaining = max(req.max_new_tokens - len(req.generated), 0)
            h = max(min(horizon, remaining), 1)
            need = (self.pos[slot] + h - 1) // self.page_size
            # Quantum overrun past max_seq_len clamps into the row's last
            # page; those slots are never attended (see step() docstring).
            need = min(need, self.max_pages - 1)
            have = len(self._pages[slot])
            while have <= need:
                (pid,) = self._alloc(1)           # covered by the admission
                self._pages[slot].append(pid)     # reservation, cannot fail
                self.block_tables[slot, have] = pid
                self._future_pages[slot] = max(self._future_pages[slot] - 1, 0)
                have += 1

    def step(self, quantum: int = 1) -> List[Request]:
        """Decode up to `quantum` tokens for every active slot in one device
        dispatch; returns requests finished during the quantum.

        quantum > 1 amortizes per-dispatch latency; requests that hit a stop
        condition mid-quantum discard their tail tokens (the slot's extra
        cache writes are harmless — they are overwritten before ever being
        attended when the slot is re-admitted)."""
        if self.num_active == 0:
            return []
        kwargs = {}
        if self.paged:
            self._ensure_pages(quantum)
            kwargs["block_table"] = jnp.asarray(self.block_tables)
        if self.lora_bank is not None:
            # Arrays + scale only: targets/rank metadata must not enter jit.
            kwargs["lora"] = {"layers": self.lora_bank["layers"],
                              "scale": self.lora_bank["scale"]}
            kwargs["adapter_ids"] = jnp.asarray(self.adapter_ids)
        sampled = self._sampling_active()
        lp = None  # (chosen_lp [B, q], top_ids [B, q, K], top_lps [B, q, K])
        if quantum == 1:
            logits, self.cache = self._step(
                self.engine.params, jnp.asarray(self.tokens),
                jnp.asarray(self.pos), self.cache,
                self.engine.cos, self.engine.sin, **kwargs,
            )
            if sampled:
                nxt = self._sample(logits, self._base_key,
                                   jnp.asarray(self.rids),
                                   jnp.asarray(self.sample_ctr),
                                   jnp.asarray(self.temps))
            else:
                nxt = jnp.argmax(logits, axis=-1)
            if self.logprobs_k is not None:
                l1, i1, v1 = self._lp_fn(logits, nxt)
                lp = (np.asarray(l1)[:, None], np.asarray(i1)[:, None],
                      np.asarray(v1)[:, None])
            toks = np.asarray(nxt, np.int32)[:, None]
        else:
            if sampled:
                out = self._step_n_fn(quantum, sampled=True)(
                    self.engine.params, jnp.asarray(self.tokens),
                    jnp.asarray(self.pos), self.cache,
                    self.engine.cos, self.engine.sin, self._base_key,
                    jnp.asarray(self.rids), jnp.asarray(self.sample_ctr),
                    jnp.asarray(self.temps), **kwargs,
                )
            else:
                out = self._step_n_fn(quantum)(
                    self.engine.params, jnp.asarray(self.tokens),
                    jnp.asarray(self.pos), self.cache,
                    self.engine.cos, self.engine.sin, **kwargs,
                )
            if self.logprobs_k is not None:
                toks, (l1, i1, v1), self.cache = out
                lp = (np.asarray(l1), np.asarray(i1), np.asarray(v1))
            else:
                toks, self.cache = out
            toks = np.asarray(toks, np.int32)  # [B, quantum]
        finished = []
        for slot, req in enumerate(self.slots):
            if req is None or req.done or req.admitting:
                continue  # mid-admission slots discard their parked tokens
            for j, tok in enumerate(map(int, toks[slot])):
                req.generated.append(tok)
                if req.logprobs is not None and lp is not None:
                    req._record_logprob(lp[0][slot, j], lp[1][slot, j],
                                        lp[2][slot, j])
                self.tokens[slot] = tok
                self.pos[slot] += 1
                if self._maybe_finish(req, tok):
                    finished.append(req)
                    break
            else:
                # Token index consumed per accepted token (finished slots are
                # re-initialized at their next admission).
                self.sample_ctr[slot] = len(req.generated)
        self._admit()
        return finished

    def _maybe_finish(self, req: Request, tok: int) -> bool:
        hit_stop = tok in req.stop_ids
        over = len(req.generated) >= req.max_new_tokens
        full = len(req.prompt_ids) + len(req.generated) >= self.args.max_seq_len
        if hit_stop or over or full:
            if hit_stop:
                req.generated.pop()  # stop token is not emitted
                if req.logprobs is not None and req.token_logprobs:
                    req.token_logprobs.pop()  # stay aligned with `generated`
                    req.top_logprobs.pop()
            self._release_slot(req)
            return True
        return False

    def _release_slot(self, req: Request) -> None:
        """Finish `req` and return its slot (and pages) to the engine."""
        req.done = True
        self.slots[req.slot] = None
        self.temps[req.slot] = 0.0
        self.adapter_ids[req.slot] = 0
        if self.paged:
            if self._registry is not None:
                # Cache the conversation (prompt + generated) so a
                # follow-up turn extending it reuses the whole history.
                # The last generated token's K/V may never have been
                # written (it was produced but not fed back), so only
                # the first L+G-1 positions are known-valid.
                n_valid = (len(req.prompt_ids) + len(req.generated) - 1)
                self._registry.register(req.text_ids[:n_valid],
                                        self._pages[req.slot],
                                        self.allocator)
            self.allocator.free(self._pages[req.slot])
            self._pages[req.slot] = []
            self._future_pages[req.slot] = 0
            self.block_tables[req.slot] = 0

    def cancel(self, req: Request) -> bool:
        """Abort a queued or active request, freeing its slot and pages for
        the next admission (the serving front-end calls this on client
        disconnect and host-side stop-string hits, so an abandoned stream
        stops burning device steps).

        Must be called from the thread that owns the engine (the same
        single-thread contract as step()/submit()).  Returns True if the
        request was live and is now finished; False if it had already
        finished.  A request mid-chunked-admission cannot be reached here:
        admission runs synchronously inside submit()/step() on the owning
        thread, so by the time the caller regains control, `admitting` is
        False."""
        if req.done:
            return False
        if req in self._queue:
            self._queue.remove(req)
            req.done = True
            return True
        if req.slot is None or self.slots[req.slot] is not req:
            return False
        if req.admitting:
            raise RuntimeError("cancel during admission (engine thread "
                               "re-entrancy) is not supported")
        self._release_slot(req)
        self._admit()  # the freed slot can seat a queued request now
        return True

    @property
    def prefix_stats(self) -> Optional[dict]:
        """Prefix-cache counters (None when prefix_cache is off)."""
        return None if self._registry is None else self._registry.stats()

    def run_to_completion(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if self.num_active == 0 and not self._queue:
                return
            self.step()
        raise RuntimeError("run_to_completion exceeded max_steps")
