"""Observability: phase timing, profiler traces, run logs, and the debug
tensor-stats trace.

TPU-native equivalents of the reference's ad-hoc sidecars (SURVEY §5):

* tokens/sec CLI stats — `GenerationStats` (byte-compatible final line is
  produced by the CLI itself; this adds the prefill-ms / decode-tok/s split
  that BASELINE.json tracks).
* `jax.profiler` traces (Perfetto/XProf) — `trace()` context manager, in
  place of the reference's manual `time.time()` loops
  (reference tests/test_dtype_comparison.py:96-108).
* per-op dtype/shape/stat logging (reference debug/debug_llama3.py:31-40 and
  the one-shot attention trace in debug/llama3-debug.py:126-250) —
  `debug_trace_forward`, which replays one forward eagerly through the same
  `ops.core` functions with a stats callback per checkpoint, and
  `make_debug_logger` for the rotating-file form.
* JSONL run log — `RunLog`.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import logging.handlers
import os
import time
from typing import Callable, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# Phase timing
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0

    @property
    def prefill_ms(self) -> float:
        return self.prefill_s * 1e3

    @property
    def decode_tok_s(self) -> float:
        return self.generated_tokens / self.decode_s if self.decode_s else 0.0

    def to_dict(self) -> Dict:
        return {
            "prompt_tokens": self.prompt_tokens,
            "generated_tokens": self.generated_tokens,
            "prefill_ms": round(self.prefill_ms, 3),
            "decode_tok_s": round(self.decode_tok_s, 1),
        }


def timed_generate(engine, input_ids, num_tokens: int) -> tuple:
    """Run prefill and decode separately with device sync, returning
    (tokens [B, num_tokens], GenerationStats)."""
    import jax
    import jax.numpy as jnp

    ids = np.asarray(input_ids)
    B, L = ids.shape
    gen = engine._gen
    if gen is None:
        from .generate import Generator
        gen = engine._gen = Generator(engine)

    cache = engine.init_cache(B)
    jax.block_until_ready(cache["k"])
    stats = GenerationStats(prompt_tokens=L, generated_tokens=num_tokens)
    if num_tokens == 0:
        return jnp.zeros((B, 0), jnp.int32), stats

    from .generate import pad_prompt
    padded, L = pad_prompt(ids, engine.args)

    t0 = time.perf_counter()
    tok0, cache = gen._prefill(engine.params, jnp.asarray(padded),
                               jnp.int32(L), cache, engine.cos, engine.sin)
    jax.block_until_ready(tok0)
    stats.prefill_s = time.perf_counter() - t0

    if num_tokens == 1:
        return tok0[:, None], stats
    t0 = time.perf_counter()
    toks, cache = gen.decode_fn(num_tokens - 1, B)(
        engine.params, tok0, jnp.int32(L), cache, engine.cos, engine.sin
    )
    jax.block_until_ready(toks)
    stats.decode_s = time.perf_counter() - t0
    engine.cache = cache
    return jnp.concatenate([tok0[:, None], toks], axis=1), stats


# ---------------------------------------------------------------------------
# Profiler
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def trace(logdir: str = "/tmp/llama3np_tpu_trace"):
    """jax.profiler trace context (view with XProf/Perfetto/TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, checks: bool = True):
    """Numerics-sanitizer context: raise on NaNs/Infs escaping jitted
    computations and enable JAX's internal checks.  The single-threaded
    reference needs no TSan analog (SURVEY §5); this is the TPU-native
    equivalent for numeric races/garbage (e.g. reading unwritten cache)."""
    import jax

    prev_nans = jax.config.jax_debug_nans
    prev_checks = jax.config.jax_enable_checks
    try:
        if nans:
            jax.config.update("jax_debug_nans", True)
        if checks:
            jax.config.update("jax_enable_checks", True)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_enable_checks", prev_checks)


# ---------------------------------------------------------------------------
# Run log (JSONL)
# ---------------------------------------------------------------------------

class RunLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def append(self, record: Dict):
        record = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


# ---------------------------------------------------------------------------
# Debug tensor-stats trace
# ---------------------------------------------------------------------------

def make_debug_logger(log_dir: str = "output/debug",
                      max_bytes: int = 10 * 1024 * 1024,
                      backups: int = 5) -> logging.Logger:
    """Rotating-file debug logger (the reference debug build's sink shape:
    10 MB x 5 rotation, reference debug/debug_llama3.py:31-40).  One logger
    per directory; repeat calls for the same dir reuse the same file.  Fed by
    `debug_trace_forward` via the CLI's ``--debug-log-dir``."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(
        f"llama3np_tpu.debug.{os.path.abspath(log_dir)}"
    )
    if not logger.handlers:
        handler = logging.handlers.RotatingFileHandler(
            os.path.join(log_dir, f"llama3np_tpu_debug_{int(time.time())}.log"),
            maxBytes=max_bytes, backupCount=backups,
        )
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.DEBUG)
        logger.propagate = False
    return logger


def _stat_line(name: str, arr) -> str:
    a = np.asarray(arr)
    if a.size == 0:
        return f"{name}: empty"
    af = a.astype(np.float64) if a.dtype.kind == "f" else a
    return (f"{name}: dtype={a.dtype}, shape={a.shape}, "
            f"min={af.min():.6f}, max={af.max():.6f}, mean={af.mean():.6f}")


def _traced_forward(engine, ids, start_pos: int, layer_kv, emit):
    """One eager (op-by-op) forward with per-checkpoint stat emission,
    threading the per-layer KV state.  layer_kv: list of (ck, cv) per layer
    ([B, KVH, M, HD]); updated in place.  Returns logits [B, 1, VS]."""
    import jax.numpy as jnp
    from .ops import core as ops

    cfg = engine.cfg
    params = engine.params
    B, L = ids.shape
    emit(_stat_line("input_ids", ids))
    h = jnp.take(params["tok_embedding"], ids, axis=0)
    emit(_stat_line("embedding", h))
    cos = engine.cos[start_pos : start_pos + L]
    sin = engine.sin[start_pos : start_pos + L]

    ly = params["layers"]
    for i in range(engine.args.n_layers):
        first = i == 0
        x = ops.rms_norm(h, ly["attn_norm"][i], cfg.norm_eps)
        if first:
            emit(_stat_line("attn_norm_out", x))
        if cfg.fused:
            q, k, v = ops.fused_qkv(x, ly["wqkv"][i], cfg.n_heads,
                                    cfg.kv_heads, cfg.head_dim)
        else:
            q = jnp.dot(x, ly["wq"][i]).reshape(B, L, cfg.n_heads, cfg.head_dim)
            k = jnp.dot(x, ly["wk"][i]).reshape(B, L, cfg.kv_heads, cfg.head_dim)
            v = jnp.dot(x, ly["wv"][i]).reshape(B, L, cfg.kv_heads, cfg.head_dim)
        if first:
            emit(_stat_line("xq", q))
            emit(_stat_line("xk", k))
            emit(_stat_line("xv", v))
        rope = ops.apply_rope_split if cfg.rope_split else ops.apply_rope
        q, k = rope(q, cos, sin), rope(k, cos, sin)
        if first:
            emit(_stat_line("rope_xq", q))
            emit(_stat_line("rope_xk", k))
        ck, cv = ops.update_kv_cache(layer_kv[i][0], layer_kv[i][1], k, v,
                                     jnp.int32(start_pos))
        layer_kv[i] = (ck, cv)
        if first:
            emit(_stat_line("k_cache", ck))
            emit(_stat_line("v_cache", cv))
        if start_pos == 0 and L > 1:
            attn = ops.causal_attention(q, k, v)
        else:
            attn = ops.cache_attention(q, ck, cv, jnp.int32(start_pos))
        if first:
            emit(_stat_line("attn_out", attn))
        h = h + ops.fused_o_proj(attn, ly["wo"][i]).astype(h.dtype)
        z = ops.rms_norm(h, ly["ffn_norm"][i], cfg.norm_eps)
        if cfg.fused:
            h = h + ops.fused_ffn(z, ly["wgu"][i], ly["w_down"][i])
        else:
            h = h + ops.swiglu(z, ly["w_gate"][i], ly["w_up"][i], ly["w_down"][i])
        if first:
            emit(_stat_line("block_out", h))

    h = ops.rms_norm(h, params["norm"], cfg.norm_eps)
    logits = jnp.dot(h[:, -1:, :], params["lm_head"])
    emit(_stat_line("logits", logits))
    return logits


def _init_layer_kv(engine, B):
    cache = engine.init_cache(B)
    return [(cache["k"][i], cache["v"][i])
            for i in range(engine.args.n_layers)]


def debug_trace_forward(engine, input_ids, start_pos: int = 0,
                        emit: Optional[Callable[[str], None]] = None) -> np.ndarray:
    """Eagerly replay one forward through the layer-0 checkpoints, emitting a
    tensor-stats line per checkpoint (the one-shot trace of reference
    debug/llama3-debug.py:136-250).  Returns the logits.

    Runs the same jnp ops outside jit (op-by-op dispatch), so stats reflect
    the real computation, not a shadow implementation.
    """
    import jax.numpy as jnp

    emit = emit or print
    ids = jnp.asarray(np.asarray(input_ids), jnp.int32)
    logits = _traced_forward(engine, ids, start_pos,
                             _init_layer_kv(engine, ids.shape[0]), emit)
    return np.asarray(logits)


def debug_trace_generate(engine, input_ids, num_tokens: int,
                         emit: Optional[Callable[[str], None]] = None) -> np.ndarray:
    """Per-token eager-replay trace of a short greedy generation: the
    reference debug build logs every op for the WHOLE generation to its
    rotating file (reference debug/debug_llama3.py:31-50); under jit a
    per-call log is meaningless, so this replays prefill + each decode
    token op-by-op, emitting the full checkpoint set per forward.

    Returns the greedy tokens [B, num_tokens] (identical to the jitted
    engine's stream — same ops, eager dispatch).
    """
    import jax.numpy as jnp

    emit = emit or print
    ids = jnp.asarray(np.asarray(input_ids), jnp.int32)
    B, L = ids.shape
    layer_kv = _init_layer_kv(engine, B)
    emit(f"=== prefill: {L} prompt tokens ===")
    logits = _traced_forward(engine, ids, 0, layer_kv, emit)
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    toks = [tok]
    for j in range(1, num_tokens):
        emit(f"=== decode token {j} (pos={L + j - 1}) ===")
        logits = _traced_forward(engine, tok[:, None], L + j - 1,
                                 layer_kv, emit)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        toks.append(tok)
    return np.stack([np.asarray(t) for t in toks], axis=1)
