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
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .generate import prefill_step
from .models.llama import forward_ragged_decode


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    stop_ids: tuple = (1, 2)  # bos/eos, the reference's stop set (quirk Q6)
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    slot: Optional[int] = None

    @property
    def text_ids(self) -> List[int]:
        return list(self.prompt_ids) + self.generated


class BatchEngine:
    """Continuous batching over a `Llama` engine's params.

    paged=True swaps the dense per-slot cache for a page pool + block tables
    (kvcache.init_paged_cache): HBM holds only pages that exist, so total
    cache memory tracks the sum of live sequence lengths instead of
    `capacity x max_seq_len`.  Pages are allocated at admission and extended
    on demand as a sequence crosses a page boundary.
    """

    def __init__(self, engine, capacity: int = 8, paged: bool = False,
                 page_size: int = 16, num_pages: Optional[int] = None):
        self.engine = engine
        self.args = engine.args
        self.cfg = engine.cfg
        self.capacity = capacity
        self.paged = paged
        from .kvcache import init_cache, init_paged_cache, PageAllocator
        if paged:
            if self.args.max_seq_len % page_size:
                raise ValueError("page_size must divide max_seq_len")
            self.page_size = page_size
            self.max_pages = self.args.max_seq_len // page_size
            if num_pages is None:
                num_pages = 1 + capacity * self.max_pages
            self.allocator = PageAllocator(num_pages)
            self.cache = init_paged_cache(self.args, num_pages, page_size)
            self.block_tables = np.zeros((capacity, self.max_pages), np.int32)
            self._pages: List[List[int]] = [[] for _ in range(capacity)]
        else:
            self.cache = init_cache(self.args, capacity)
        self.pos = np.zeros(capacity, np.int32)       # next write position
        self.tokens = np.zeros(capacity, np.int32)    # last token per slot
        self.slots: List[Optional[Request]] = [None] * capacity
        self._ids = itertools.count()
        self._queue: List[Request] = []
        self._prefill = jax.jit(partial(prefill_step, cfg=self.cfg))
        self._step = jax.jit(partial(forward_ragged_decode, cfg=self.cfg),
                             donate_argnums=(3,))

    # -- admission -----------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int,
               stop_ids=(1, 2)) -> Request:
        req = Request(next(self._ids), list(prompt_ids), max_new_tokens,
                      tuple(stop_ids))
        self._queue.append(req)
        self._admit()
        return req

    def _admit(self):
        for slot in range(self.capacity):
            if not self._queue:
                return
            if self.slots[slot] is not None:
                continue
            req = self._queue.pop(0)
            L = len(req.prompt_ids)
            if L + req.max_new_tokens > self.args.max_seq_len:
                raise ValueError("request exceeds max_seq_len")
            self._prefill_into(slot, req)

    def _prefill_into(self, slot: int, req: Request):
        eng = self.engine
        L = len(req.prompt_ids)
        buckets = [b for b in self.args.prefill_buckets
                   if b <= self.args.max_seq_len]
        P = next((b for b in buckets if b >= L), self.args.max_seq_len)
        P = max(P, L)
        padded = np.zeros((1, P), np.int32)
        padded[0, :L] = req.prompt_ids
        from .kvcache import init_cache
        row_cache = init_cache(self.args, 1)
        tok0, row_cache = self._prefill(eng.params, jnp.asarray(padded),
                                        jnp.int32(L), row_cache,
                                        eng.cos, eng.sin)
        if self.paged:
            # Allocate pages covering the prompt plus tok0's upcoming write,
            # then scatter the dense prefill rows page by page.
            page = self.page_size
            n_needed = -(-(L + 1) // page)
            pages = self.allocator.alloc(n_needed)
            self._pages[slot] = pages
            self.block_tables[slot] = 0
            self.block_tables[slot, :n_needed] = pages
            kp, vp = self.cache["k"], self.cache["v"]
            for i, pid in enumerate(pages):
                lo = i * page
                # [NL, KVH, page, HD] -> [NL, page, KVH, HD]
                k_rows = row_cache["k"][:, 0, :, lo : lo + page].transpose(0, 2, 1, 3)
                v_rows = row_cache["v"][:, 0, :, lo : lo + page].transpose(0, 2, 1, 3)
                kp = kp.at[:, pid].set(k_rows)
                vp = vp.at[:, pid].set(v_rows)
            self.cache = {"k": kp, "v": vp}
        else:
            # Scatter the prefilled rows into this slot.
            self.cache = {
                "k": self.cache["k"].at[:, slot].set(row_cache["k"][:, 0]),
                "v": self.cache["v"].at[:, slot].set(row_cache["v"][:, 0]),
            }
        first = int(np.asarray(tok0)[0])
        req.slot = slot
        self.slots[slot] = req
        req.generated.append(first)
        self.tokens[slot] = first
        self.pos[slot] = L  # `first`'s own position; written by next step
        self._maybe_finish(req, first)

    # -- stepping ------------------------------------------------------------

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slots)

    def _ensure_pages(self):
        """Grow any active row whose next write crosses into an unallocated
        page (the write this step lands at pos[slot])."""
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            need = self.pos[slot] // self.page_size
            have = len(self._pages[slot])
            while have <= need:
                (pid,) = self.allocator.alloc(1)
                self._pages[slot].append(pid)
                self.block_tables[slot, have] = pid
                have += 1

    def step(self) -> List[Request]:
        """Decode one token for every active slot; returns requests finished
        on this step."""
        if self.num_active == 0:
            return []
        if self.paged:
            self._ensure_pages()
            logits, self.cache = self._step(
                self.engine.params, jnp.asarray(self.tokens),
                jnp.asarray(self.pos), self.cache,
                self.engine.cos, self.engine.sin,
                block_table=jnp.asarray(self.block_tables),
            )
        else:
            logits, self.cache = self._step(
                self.engine.params, jnp.asarray(self.tokens),
                jnp.asarray(self.pos), self.cache,
                self.engine.cos, self.engine.sin,
            )
        nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        finished = []
        for slot, req in enumerate(self.slots):
            if req is None or req.done:
                continue
            tok = int(nxt[slot])
            req.generated.append(tok)
            self.tokens[slot] = tok
            self.pos[slot] += 1
            if self._maybe_finish(req, tok):
                finished.append(req)
        self._admit()
        return finished

    def _maybe_finish(self, req: Request, tok: int) -> bool:
        hit_stop = tok in req.stop_ids
        over = len(req.generated) >= req.max_new_tokens
        full = len(req.prompt_ids) + len(req.generated) >= self.args.max_seq_len
        if hit_stop or over or full:
            if hit_stop:
                req.generated.pop()  # stop token is not emitted
            req.done = True
            self.slots[req.slot] = None
            if self.paged:
                self.allocator.free(self._pages[req.slot])
                self._pages[req.slot] = []
                self.block_tables[req.slot] = 0
            return True
        return False

    def run_to_completion(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if self.num_active == 0 and not self._queue:
                return
            self.step()
        raise RuntimeError("run_to_completion exceeded max_steps")
