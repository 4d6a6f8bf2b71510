"""Speculative decoding: a cheap draft model proposes k tokens, the target
verifies all of them in ONE forward, and every accepted token costs the
target a fraction of a decode step's weight traffic.

Single-stream decode is memory-bound at the measured ~767 GB/s streaming
peak (scripts/roofline.py): each emitted token streams every weight byte
once.  A verify pass over k+1 tokens streams the SAME bytes as a 1-token
step (the matmuls go from M=1 to M=k+1 — free on the MXU), so with
acceptance ~1 the target's bytes/token drop ~(k+1)x and the remaining
cost is the draft.  New capability beyond the reference (nothing
comparable exists there); greedy-lossless by construction: every emitted
token is the target's own argmax, so the stream equals the target-only
greedy stream (exact on CPU fp32; pinned by tests/test_speculative.py).
One honest caveat: the verify pass computes logits with M=k+1 matmuls
while the decode path uses M=1 — on TPU at default matmul precision the
two realizations can resolve a NEAR-TIE argmax differently (measured: a
0.1-logit gap flip at stories15M/bf16-precision scale), the same
realization-difference class as the repo's documented XLA-vs-Pallas bf16
caveat (BENCHMARKS.md).  Each such divergence is still a valid greedy
choice of the target model within matmul precision.

TPU-native design — the whole generation is ONE jitted lax.while_loop
(one dispatch per generate call; no data-dependent Python control flow):

  * draft scan: k+1 single-token decode steps (`models.llama.forward`)
    propose d_0..d_{k-1}; the extra step processes d_{k-1} itself so the
    draft cache has no hole at slot pos+k on full acceptance.
  * verify: one `forward_hidden` over the window [cur, d_0..d_{k-1}]
    (L = k+1, first_chunk=False — `ops.cache_attention` masks each query
    offset to kv_idx <= pos + offset), then logits at ALL k+1 positions.
  * accept: a = length of the matching greedy prefix; emit d_0..d_{a-1}
    plus the target's bonus token g_a — a+1 tokens per round, a in [0, k].
  * no rollback: rejected tail slots (both caches) hold junk K/V, but the
    engine's write-before-attend invariant makes them unreachable — every
    future step writes slot `pos` before any query attends it, and masks
    to kv_idx <= pos until then (the same invariant padded prefill tails
    and recycled serving slots rely on; see CLAUDE.md invariants).

The built-in recipe is QUANTIZED SELF-SPECULATION (`quantized_draft`):
draft = the same weights int8-quantized — half (vs bf16) or a quarter
(vs fp32) of the bytes with near-1 greedy agreement, so no second model
or distillation is needed.  Any Llama engine sharing the vocabulary works
as a draft; a genuinely smaller model gives bigger wins.

Scope: greedy, batch 1 (speculation is a latency lever; batched serving
amortizes weight bytes across rows instead — scripts/batched_decode.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .models.llama import Llama, forward, forward_hidden, lm_logits
from .ops import core as ops


def quantized_draft(weights: Dict, args) -> Llama:
    """int8 self-draft: the target's own weights, weight-only quantized."""
    import dataclasses

    return Llama(weights, dataclasses.replace(args, quant="int8"))


class SpeculativeGenerator:
    """Greedy speculative decode of `target` guided by `draft`.

    target, draft: single-chip Llama engines over the same vocabulary.
    k: draft tokens proposed per verify pass.

    After each generate_tokens call, `last_stats` holds
    {"tokens": emitted, "rounds": verify rounds, "accept_rate":
    mean accepted per round / k}.
    """

    def __init__(self, target: Llama, draft: Llama, k: int = 4):
        if target.args.vocab_size != draft.args.vocab_size:
            raise ValueError("target and draft must share a vocabulary")
        if k < 1:
            raise ValueError("k must be >= 1")
        self.target = target
        self.draft = draft
        self.k = k
        self.last_stats = None
        self._fns = {}  # (num_tokens, prompt_bucket) -> jitted loop

    # -- jitted program ------------------------------------------------------

    def _build(self, num_tokens: int):
        t_cfg, d_cfg = self.target.cfg, self.draft.cfg
        k = self.k

        def spec_loop(t_params, d_params, ids, L, t_cache, d_cache,
                      t_cos, t_sin, d_cos, d_sin):
            # Prefill both models over the padded bucket (junk K/V beyond
            # the true length L is masked until overwritten — the
            # write-before-attend invariant), then replay the last REAL
            # prompt token for its exact logits.  The replay re-writes slot
            # L-1 with identical K/V (same token, same position).
            _, t_cache = forward(t_params, ids, jnp.int32(0), t_cache,
                                 t_cos, t_sin, cfg=t_cfg, first_chunk=True)
            _, d_cache = forward_hidden(d_params, ids, jnp.int32(0), d_cache,
                                        d_cos, d_sin, cfg=d_cfg,
                                        first_chunk=True)
            last = jax.lax.dynamic_slice_in_dim(ids, L - 1, 1, axis=1)
            lg, t_cache = forward(t_params, last, L - 1, t_cache,
                                  t_cos, t_sin, cfg=t_cfg, first_chunk=False)
            cur = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)  # [1]

            buf = jnp.zeros((num_tokens + k + 1,), jnp.int32)
            buf = jax.lax.dynamic_update_index_in_dim(buf, cur[0], 0, 0)

            def cond(carry):
                count = carry[0]
                return count < num_tokens

            def body(carry):
                count, rounds, pos, cur, t_cache, d_cache, buf = carry

                # Draft: k+1 steps — iteration i processes the token at
                # absolute slot pos+i (cur, d_0, ..., d_{k-1}); yields
                # proposals d_0..d_k of which the first k are used.
                def d_step(c, i):
                    tok, dc = c
                    lg, dc = forward(d_params, tok[:, None], pos + i, dc,
                                     d_cos, d_sin, cfg=d_cfg,
                                     first_chunk=False)
                    nxt = jnp.argmax(lg[:, -1, :], axis=-1).astype(jnp.int32)
                    return (nxt, dc), nxt

                (_, d_cache), props = jax.lax.scan(
                    d_step, (cur, d_cache), jnp.arange(k + 1))
                props = props[:k, 0]  # [k]

                # Target verifies [cur, d_0..d_{k-1}] in one pass, writing
                # slots pos..pos+k and reading logits at every offset.
                window = jnp.concatenate([cur, props])[None, :]  # [1, k+1]
                h, t_cache = forward_hidden(t_params, window, pos, t_cache,
                                            t_cos, t_sin, cfg=t_cfg,
                                            first_chunk=False)
                h = ops.rms_norm(h, t_params["norm"], t_cfg.norm_eps)
                g = jnp.argmax(lm_logits(t_params, h, t_cfg.precision)[0],
                               axis=-1).astype(jnp.int32)  # [k+1]

                eq = props == g[:k]
                a = jnp.where(eq.all(), k, jnp.argmin(eq)).astype(jnp.int32)
                # Emit d_0..d_{a-1} then the bonus g_a, as a fixed-size
                # window whose invalid tail the next round overwrites.
                emitted = jnp.where(jnp.arange(k + 1) < a,
                                    jnp.concatenate([props, g[k:]]), 0)
                emitted = emitted.at[a].set(g[a])
                buf = jax.lax.dynamic_update_slice(buf, emitted, (count,))
                return (count + a + 1, rounds + 1, pos + a + 1, g[a][None],
                        t_cache, d_cache, buf)

            count, rounds, *_rest, buf = jax.lax.while_loop(
                cond, body,
                (jnp.int32(1), jnp.int32(0), L, cur, t_cache, d_cache, buf))
            return buf, count, rounds

        return jax.jit(spec_loop, donate_argnums=(4, 5))

    # -- host API ------------------------------------------------------------

    def generate_tokens(self, input_ids, num_tokens: int) -> np.ndarray:
        """Greedy tokens [1, num_tokens], token-identical to the target-only
        stream (tests/test_speculative.py pins the identity)."""
        from .generate import pad_prompt

        ids = np.asarray(input_ids, np.int32)
        if ids.ndim != 2 or ids.shape[0] != 1:
            raise ValueError("speculative decode is single-stream (B=1)")
        t, d = self.target, self.draft
        padded, L = pad_prompt(ids, t.args)
        if L + num_tokens + self.k + 1 > t.args.max_seq_len or \
                L + num_tokens + self.k + 1 > d.args.max_seq_len:
            raise ValueError("prompt + num_tokens + k exceeds max_seq_len")

        key = (num_tokens, padded.shape[1])
        if key not in self._fns:
            self._fns[key] = self._build(num_tokens)
        buf, count, rounds = self._fns[key](
            t.params, d.params, jnp.asarray(padded), jnp.int32(L),
            t.init_cache(1), d.init_cache(1), t.cos, t.sin, d.cos, d.sin)
        count, rounds = int(np.asarray(count)), int(np.asarray(rounds))
        self.last_stats = {
            "tokens": count, "rounds": rounds,
            "accept_rate": ((count - 1) / rounds - 1) / self.k
            if rounds else 1.0,
        }
        return np.asarray(buf)[:num_tokens][None, :]
