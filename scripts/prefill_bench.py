#!/usr/bin/env python
"""Prefill characterization: tokens/s and MFU across scales and paths.

Prefill is the compute-bound phase — the one place this chip can show real
MFU (decode is bytes-bound; BENCHMARKS.md roofline section).  This measures
the three prefill realizations the framework carries:

  * plain   — dense causal attention (ops.causal_attention), the O(L^2)
              score tensor materialized;
  * block   — blockwise/flash-semantics XLA attention (kv_block=512),
              peak memory O(L * block);
  * flash   — the Pallas flash-prefill kernel (ops/kernels/flash_prefill).

at stories110M / TinyLlama-1.1B / llama3-8b widths, prompt lengths 512 and
2048.  Timing is MARGINAL over two scan lengths — a jitted lax.scan runs the
whole prefill N times back-to-back (weights re-stream every iteration, as
they would across requests), and (T(N2) - T(N1)) / (N2 - N1) cancels the
~24 ms dispatch tunnel (BENCHMARKS.md measurement rules).

MFU counts issued matmul FLOPs (projections + FFN + lm_head on the last
position + full L x L attention scores/outputs — the dense work the plain
path actually performs; causal skipping would halve the attention term) vs
the v5e bf16 peak (197 TFLOP/s; fp32 runs are still normalized to bf16 peak
so columns compare).

Run on the real chip:  python scripts/prefill_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PEAK_BF16 = 197e12  # v5e TensorCore peak, bf16 matmul


def prefill_flops(args, L: int) -> float:
    D, FD, HD = args.dim, args.hidden_dim, args.head_dim
    NH, KVH, NL, VS = args.n_heads, args.kv_heads, args.n_layers, args.vocab_size
    per_layer = (
        2 * L * D * (NH + 2 * KVH) * HD        # qkv projections
        + 2 * L * NH * HD * D                  # o projection
        + 3 * 2 * L * D * FD                   # gate/up/down
        + 2 * 2 * NH * L * L * HD              # scores + probs@V (full LxL)
    )
    return NL * per_layer + 2 * D * VS         # lm_head on last position


def time_prefill(engine, L: int, n_lo=8, n_hi=72) -> float:
    # The spread must be wide: a 512-token stories110M prefill is ~0.6 ms
    # device-side, so a 4-prefill spread would drown in ~ms dispatch jitter
    # (the first run of this bench did exactly that).  64 extra prefills
    # put 40 ms - 1 s of signal behind the two timed dispatches.
    """Marginal seconds per whole-prompt prefill (tunnel cancelled)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from llama3np_tpu.generate import prefill_logits
    from llama3np_tpu.kvcache import init_cache

    args, cfg = engine.args, engine.cfg
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, args.vocab_size, size=(1, L)),
                      jnp.int32)
    cache = init_cache(args, 1, max_seq_len=L)

    def many(params, ids, cache, cos, sin, n):
        # The carry must feed the next iteration's INPUT: a first-chunk
        # prefill never reads the cache (it only writes it), so a plain
        # repeat-the-prefill scan is loop-invariant and XLA hoists the
        # whole body out — T(n) flat in n, garbage marginals (the roofline
        # probe's loop-carried-matvec rule, BENCHMARKS.md round 3).
        def body(c, _):
            ids_c, cache = c
            logits, cache = prefill_logits(params, ids_c, jnp.int32(L),
                                           cache, cos, sin, cfg=cfg)
            bump = (jnp.argmax(logits[0]) % 3).astype(jnp.int32)
            ids_next = (ids_c + bump) % args.vocab_size
            return (ids_next, cache), logits[0, 0]
        _, out = jax.lax.scan(body, (ids, cache), None, length=n)
        return out

    fns = {n: jax.jit(partial(many, n=n)) for n in (n_lo, n_hi)}
    t = {}
    for n, fn in fns.items():
        # Force a host transfer to close the timing (np.asarray), matching
        # the repo's other marginal benches — block_until_ready alone has
        # proven unreliable through the dev-tunnel backend (T(n) came back
        # flat in n while the device demonstrably ran the iterations).
        np.asarray(fn(engine.params, ids, cache, engine.cos, engine.sin))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(
                fn(engine.params, ids, cache, engine.cos, engine.sin))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo)


def main():
    import jax
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    configs = [
        ("stories110M", dict(dtype="bfloat16")),
        ("tinyllama-1.1b", dict(dtype="bfloat16")),
        ("llama3-8b", dict(n_layers=2, dtype="bfloat16")),
    ]
    paths = [
        ("plain", dict(prefill_kv_block=0, attn_impl="xla")),
        ("block", dict(prefill_kv_block=512, attn_impl="xla")),
        ("flash", dict(prefill_kv_block=512, attn_impl="pallas")),
    ]
    rows = []
    for name, overrides in configs:
        base = preset(name, max_seq_len=2048, fuse_matmuls=False, **overrides)
        weights = synthetic_weights(base, seed=0)
        for pname, povr in paths:
            args = preset(name, max_seq_len=2048, fuse_matmuls=False,
                          prefill_buckets=(512, 2048), **overrides, **povr)
            engine = Llama(weights, args)
            for L in (512, 2048):
                try:
                    sec = time_prefill(engine, L)
                except Exception as e:  # one path must not kill the table
                    print(f"{name:16s} {pname:6s} L={L:5d}: FAILED "
                          f"({type(e).__name__}: {str(e)[:90]})", flush=True)
                    continue
                fl = prefill_flops(args, L)
                mfu = fl / sec / PEAK_BF16
                rows.append((name, pname, L, L / sec, sec * 1e3, mfu))
                print(f"{name:16s} {pname:6s} L={L:5d}: "
                      f"{L / sec:10,.0f} tok/s  {sec * 1e3:8.2f} ms  "
                      f"MFU {mfu * 100:5.1f}%", flush=True)
            del engine
        del weights

    print("\n| model | path | L | tok/s | ms | MFU |")
    print("|---|---|---|---|---|---|")
    for name, pname, L, tps, ms, mfu in rows:
        print(f"| {name} | {pname} | {L} | {tps:,.0f} | {ms:.2f} | "
              f"{mfu * 100:.1f}% |")


if __name__ == "__main__":
    main()
