"""Fused generation: jitted prefill + `lax.scan` greedy decode.

The reference's generation loop is a Python for-loop dispatching ~58 NumPy
ops per token (reference llama3.py:310-321; SURVEY §3.2) — per-token host
overhead dominates.  Here the whole decode runs as one XLA computation: a
`lax.scan` whose carry is (token, position, KV cache), so N tokens cost one
dispatch and one device->host transfer.  Prompt lengths and step counts are
bucketed to keep shapes static (each (batch, bucket, steps-bucket) combination
compiles once and is cached).

Phases are split into two jitted callables — `prefill` and `decode` — so
benchmarks and the profiler see them separately (the BASELINE.json metric is
prefill-ms + decode-tok/s).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.llama import (StaticConfig, embed_tokens, forward_hidden,
                           forward, lm_logits)
from .ops import core as ops


def _last_logits(params, h, true_len, cfg: StaticConfig):
    """Logits at the last real prompt position (true_len - 1)."""
    h_last = jax.lax.dynamic_slice_in_dim(h, true_len - 1, 1, axis=1)
    h_last = ops.rms_norm(h_last, params["norm"], cfg.norm_eps)
    return lm_logits(params, h_last, cfg.precision)


def prefill_logits(params, ids_padded, true_len, cache, cos, sin,
                   cfg: StaticConfig):
    """Prefill a (padded) prompt at position 0; returns (next-token logits
    [B, VS], updated cache).

    ids_padded: [B, P] with the real prompt in [:, :true_len]; padded tail
    K/V land in cache slots >= true_len but are never attended: decode masks
    to kv_idx <= pos and overwrites those slots one per step.
    """
    h, cache = forward_hidden(params, ids_padded, jnp.int32(0), cache,
                              cos, sin, cfg, first_chunk=True)
    logits = _last_logits(params, h, true_len, cfg)
    return logits[:, -1, :], cache


def prefill_step(params, ids_padded, true_len, cache, cos, sin,
                 cfg: StaticConfig):
    """`prefill_logits` reduced to the first greedy token ([B], cache)."""
    logits, cache = prefill_logits(params, ids_padded, true_len, cache,
                                   cos, sin, cfg)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return tok0, cache


def decode_steps(params, tok, pos, cache, cos, sin, cfg: StaticConfig,
                 num_steps: int, token_unroll: int = 1):
    """Greedy-decode `num_steps` tokens starting from `tok` at `pos`.

    Returns (tokens [B, num_steps], updated cache).  tokens[:, 0] is the
    argmax successor of `tok`; `tok`'s own K/V is written at slot `pos`.
    `token_unroll` unrolls the scan body (amortizes while-loop overhead at
    the cost of compile time; the step dependence chain is unchanged).
    """
    def step(carry, _):
        tok, pos, cache = carry
        logits, cache = forward(params, tok[:, None], pos, cache, cos, sin,
                                cfg, first_chunk=False)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return (nxt, pos + 1, cache), nxt

    (_, _, cache), toks = jax.lax.scan(
        step, (tok, pos, cache), length=num_steps,
        unroll=token_unroll if num_steps % token_unroll == 0 else 1,
    )
    return toks.T, cache  # [B, num_steps]


def pallas_decode_steps(params, tok, pos, cache, cos, sin, cfg: StaticConfig,
                        num_steps: int, interpret: bool = False,
                        token_unroll: int = 1):
    """`decode_steps` with the whole per-token layer stack fused into one
    Pallas kernel (ops.kernels.decode_step).  Batch-1 only; params must be in
    fused + rope-split layout (the single-chip engine default).

    The greedy head stays on XLA deliberately: inside the scan XLA hoists a
    loop-invariant bf16 convert of lm_head (--xla_allow_excess_precision) and
    its matvec reads half the bytes at full bandwidth (~8 us/token measured);
    a Pallas lm_head+argmax kernel (ops.kernels.greedy_head) was measured 6x
    slower at fp32 (M=1 matvec limits; see BENCHMARKS.md round-2 notes)."""
    from .ops.kernels.decode_step import decode_layers

    kc = cache["k"][:, 0]  # [NL, KVH, M, HD] (B == 1)
    vc = cache["v"][:, 0]

    def step(carry, _):
        tok, pos, kc, vc = carry
        x = embed_tokens(params, tok)  # [1, D]
        cos_row = jax.lax.dynamic_slice_in_dim(cos, pos, 1)
        sin_row = jax.lax.dynamic_slice_in_dim(sin, pos, 1)
        x, kc, vc = decode_layers(
            params["layers"], x, pos, kc, vc, cos_row, sin_row,
            n_heads=cfg.n_heads, kv_heads=cfg.kv_heads,
            head_dim=cfg.head_dim, norm_eps=cfg.norm_eps,
            interpret=interpret, stream_plan=cfg.stream_plan,
        )
        h = ops.rms_norm(x, params["norm"], cfg.norm_eps)
        logits = lm_logits(params, h, cfg.precision)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [1]
        return (nxt, pos + 1, kc, vc), nxt

    (_, _, kc, vc), toks = jax.lax.scan(
        step, (tok, pos, kc, vc), length=num_steps,
        unroll=token_unroll if num_steps % token_unroll == 0 else 1,
    )
    cache = {"k": kc[:, None], "v": vc[:, None]}
    return toks.T, cache  # [1, num_steps]


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


def pad_prompt(input_ids: np.ndarray, args) -> Tuple[np.ndarray, int]:
    """Pad a host prompt [B, L] to its static prefill bucket.

    The single source of the bucketing rule (used by the Generator, the
    timed benchmark path, and the serving engine): smallest configured
    bucket >= L, never below L, never above max_seq_len.
    Returns (padded [B, P] int32, true length L).
    """
    ids = np.asarray(input_ids)
    B, L = ids.shape
    buckets = [b for b in args.prefill_buckets if b <= args.max_seq_len] \
        or [args.max_seq_len]
    P = max(_bucket(L, buckets), L)
    padded = np.zeros((B, P), np.int32)
    padded[:, :L] = ids
    return padded, L


DECODE_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def plan_decode_segments(rest: int, L: int, M: int,
                         buckets=DECODE_BUCKETS) -> list:
    """Decompose `rest` decode steps into bucket-sized scan segments.

    A single power-of-two bucket wastes up to ~2x device work (a 513-token
    request would run a 1024-step scan and discard half — VERDICT r2 weak
    #5).  Greedy binary decomposition over the same bucket set keeps the
    compiled-function cache shared (every segment size is a bucket) while
    bounding discarded steps by the smallest bucket: 513 -> [512, 16]
    (15 discarded), 1008 -> [512, 256, 128, 64, 32, 16] (0 discarded).
    Each segment is one dispatch; on directly-attached hardware extra
    dispatches are ~free, and the single-segment case (the bench headline)
    is unchanged.

    The cache bound caps the total at M - L - 1 steps (same rule as the old
    near-capacity fallback): the final segment is clamped so no scan
    iteration ever writes past the dense cache.
    """
    cap = M - L - 1
    assert rest <= cap, (rest, L, M)
    segments = []
    consumed = 0
    for b in sorted(buckets, reverse=True):
        while rest - consumed >= b and consumed + b <= cap:
            segments.append(b)
            consumed += b
    if consumed < rest:
        tail = min(-(-(rest - consumed) // 16) * 16, cap - consumed)
        assert consumed + tail >= rest, (rest, L, M, segments)
        segments.append(tail)
    return segments


# ---------------------------------------------------------------------------
# Sampling (extension beyond the reference's greedy-only scope)
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class Sampling:
    """Token-sampling policy.  temperature == 0 degenerates to greedy.
    Hashable (static under jit); a policy change recompiles the decode loop
    once."""
    temperature: float = 1.0
    top_k: int = 0        # 0 = disabled
    top_p: float = 1.0    # 1.0 = disabled
    seed: int = 0


def sample_token(logits, key, sampling: Sampling):
    """Sample one token per row from [B, VS] f32 logits."""
    if sampling.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / sampling.temperature
    if sampling.top_k:
        kth = jax.lax.top_k(scaled, sampling.top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if sampling.top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive cumsum
        cutoff_idx = jnp.sum((cum < sampling.top_p).astype(jnp.int32),
                             axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled).astype(jnp.int32)


def sampled_decode_steps(params, tok, pos, cache, cos, sin, key,
                         cfg: StaticConfig, num_steps: int,
                         sampling: Sampling):
    """`decode_steps` with stochastic token selection; the PRNG key rides the
    scan carry and splits per step, so streams are reproducible per seed."""
    def step(carry, _):
        tok, pos, cache, key = carry
        logits, cache = forward(params, tok[:, None], pos, cache, cos, sin,
                                cfg, first_chunk=False)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, -1, :], sub, sampling)
        return (nxt, pos + 1, cache, key), nxt

    (_, _, cache, _), toks = jax.lax.scan(step, (tok, pos, cache, key),
                                          length=num_steps)
    return toks.T, cache


class Generator:
    """Compiled-function cache + padding/bucketing around the fused loop."""

    def __init__(self, engine):
        self.engine = engine
        self.args = engine.args
        self.cfg = engine.cfg
        self._prefill = jax.jit(partial(prefill_step, cfg=self.cfg),
                                donate_argnums=(3,))
        self._prefill_logits = jax.jit(partial(prefill_logits, cfg=self.cfg),
                                       donate_argnums=(3,))
        self._decode = {}  # (num_steps, batch) -> jitted decode

    def _use_pallas(self, batch: int) -> bool:
        impl = self.args.attn_impl
        if impl == "xla" or batch != 1:
            return False
        if not (self.cfg.fused and self.cfg.rope_split):
            return False
        if self.args.quant and not self.cfg.stream_plan:
            # Only the streamed layout consumes int8 scale blocks.
            return False
        if impl == "pallas":
            return True
        # auto: real TPU only (interpret mode is for tests, forced via
        # attn_impl="pallas") and a viable VMEM plan — whole layer resident,
        # FFN streamed in column blocks, attention additionally streamed per
        # KV-head group, or the fully streamed 8B-class plan (the engine
        # already laid the params out accordingly, cfg.stream_plan set);
        # no plan at all means the XLA scan applies.  Caches are read-only
        # inside the kernels (new rows scattered by XLA afterwards), so any
        # cache dtype works.
        if (self.args.pallas_ffn_block is None
                and self.args.pallas_stream is None
                and not self.cfg.stream_plan):
            from .ops.kernels.decode_step import plan_layout
            if plan_layout(self.args) is None:
                return False
        return jax.default_backend() not in ("cpu",)

    def decode_fn(self, num_steps: int, batch: int = 1):
        key = (num_steps, batch)
        if key not in self._decode:
            unroll = getattr(self.args, "decode_token_unroll", 1)
            if self._use_pallas(batch):
                interpret = jax.default_backend() == "cpu"
                fn = partial(pallas_decode_steps, cfg=self.cfg,
                             num_steps=num_steps, interpret=interpret,
                             token_unroll=unroll)
            else:
                fn = partial(decode_steps, cfg=self.cfg, num_steps=num_steps,
                             token_unroll=unroll)
            self._decode[key] = jax.jit(fn, donate_argnums=(3,))
        return self._decode[key]

    def sampled_decode_fn(self, num_steps: int, sampling: Sampling):
        key = (num_steps, "sampled", sampling)
        if key not in self._decode:
            self._decode[key] = jax.jit(
                partial(sampled_decode_steps, cfg=self.cfg,
                        num_steps=num_steps, sampling=sampling),
                donate_argnums=(3,),
            )
        return self._decode[key]

    def generate(self, params, input_ids: np.ndarray, cache: Dict,
                 num_tokens: int,
                 sampling: "Sampling | None" = None) -> Tuple[jax.Array, Dict]:
        """Decode `num_tokens` tokens after the prompt — greedy by default,
        stochastic with a `Sampling` policy.

        input_ids: host int array [B, L].  Returns ([B, num_tokens], cache).
        Requires L + num_tokens <= max_seq_len (the dense cache bound).
        """
        eng = self.engine
        B, L = input_ids.shape
        M = self.args.max_seq_len
        if L + num_tokens > M:
            raise ValueError(
                f"prompt ({L}) + num_tokens ({num_tokens}) exceeds max_seq_len ({M})"
            )
        if num_tokens == 0:
            return jnp.zeros((B, 0), jnp.int32), cache

        padded, L = pad_prompt(input_ids, self.args)
        stochastic = sampling is not None and sampling.temperature > 0.0
        if stochastic:
            rng = jax.random.PRNGKey(sampling.seed)
            rng, sub = jax.random.split(rng)
            logits0, cache = self._prefill_logits(
                params, jnp.asarray(padded), jnp.int32(L), cache,
                eng.cos, eng.sin)
            tok0 = sample_token(logits0, sub, sampling)
        else:
            tok0, cache = self._prefill(params, jnp.asarray(padded),
                                        jnp.int32(L), cache, eng.cos, eng.sin)
        if num_tokens == 1:
            return tok0[:, None], cache

        rest = num_tokens - 1
        # Bucket-sized scan segments chained on device state (tok, pos,
        # cache): discarded steps are bounded by the smallest bucket instead
        # of ~2x for lengths just past a power of two.
        segments = plan_decode_segments(rest, L, M)
        pieces = [tok0[:, None]]
        tok, pos = tok0, L
        for i, S in enumerate(segments):
            if stochastic:
                toks, cache = self.sampled_decode_fn(S, sampling)(
                    params, tok, jnp.int32(pos), cache, eng.cos, eng.sin,
                    jax.random.fold_in(rng, i)
                )
            else:
                toks, cache = self.decode_fn(S, B)(
                    params, tok, jnp.int32(pos), cache, eng.cos, eng.sin)
            pieces.append(toks)
            tok, pos = toks[:, -1], pos + S
        out = jnp.concatenate(pieces, axis=1)[:, : num_tokens]
        return out, cache
