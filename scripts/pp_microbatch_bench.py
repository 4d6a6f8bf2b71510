#!/usr/bin/env python
"""Microbatched-pipeline wall-clock evidence (VERDICT r2 next #5).

The single-microbatch ring runs every stage every round and keeps one
stage's output per round: S*S stage-scans of B rows per token, 1/S useful.
The microbatched schedule (parallel/pipeline.py pp_generate_mb_fn) splits
the batch into S packets of B/S rows that keep every stage busy on useful
work: S*B row-stage-scans per token — an S-times total-compute drop at the
same round count.

On the virtual CPU mesh all "devices" share the host's cores, so the
wall-clock ratio directly reflects the total-compute drop (the acceptance
form VERDICT r2 names: pipelined throughput >= 2x the naive ring at S=4
with B=4 microbatches, wall-clock on the virtual mesh, token identity).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python scripts/pp_microbatch_bench.py
(env is forced below if unset)
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timed(fn, *args, reps=3):
    fn(*args)  # compile/warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    from llama3np_tpu import ModelArgs, synthetic_weights
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.parallel.pipeline import (PipelinedLlama, make_pp_mesh,
                                                make_pp_tp_mesh)

    assert len(jax.devices()) >= 8, "needs the 8-device virtual CPU mesh"
    args = ModelArgs(dim=512, n_layers=8, n_heads=8, n_kv_heads=4,
                     vocab_size=4096, max_seq_len=128, hidden_dim=1408,
                     max_batch_size=4)
    weights = synthetic_weights(args, seed=0)
    S, B, L, N = 4, 4, 16, 32
    rng = np.random.default_rng(0)
    ids = rng.integers(10, args.vocab_size, size=(B, L)).astype(np.int32)

    solo = Llama(synthetic_weights(args, seed=0), args)
    ref = np.asarray(solo.generate_tokens(ids, N))

    pp = PipelinedLlama(weights, args, make_pp_mesh(S))
    t_naive = timed(lambda: pp.generate_tokens(ids, N))
    toks_naive = np.asarray(pp.generate_tokens(ids, N))
    t_mb = timed(lambda: pp.generate_tokens(ids, N, microbatched=True))
    toks_mb = np.asarray(pp.generate_tokens(ids, N, microbatched=True))
    assert (toks_naive == ref).all(), "naive ring diverged from single-chip"
    assert (toks_mb == ref).all(), "microbatched ring diverged"

    pptp = PipelinedLlama(weights, args, make_pp_tp_mesh(S, 2))
    t_pptp = timed(lambda: pptp.generate_tokens(ids, N, microbatched=True))
    toks_pptp = np.asarray(pptp.generate_tokens(ids, N, microbatched=True))
    assert (toks_pptp == ref).all(), "pp x tp microbatched diverged"

    print(f"\nS={S} stages, B={B}, {N} tokens, "
          f"dim {args.dim} x {args.n_layers}L (virtual CPU mesh)")
    print(f"| naive ring            | {t_naive*1e3:8.1f} ms | 1.00x |")
    print(f"| microbatched ring     | {t_mb*1e3:8.1f} ms | "
          f"{t_naive/t_mb:.2f}x |")
    print(f"| microbatched pp x tp2 | {t_pptp*1e3:8.1f} ms | "
          f"{t_naive/t_pptp:.2f}x |")
    ratio = t_naive / t_mb
    assert ratio >= 2.0, f"bubble fill below the 2x bar: {ratio:.2f}x"
    print(f"\nPASS: microbatched >= 2x naive ({ratio:.2f}x), "
          "token-identical to the single-chip engine")


if __name__ == "__main__":
    main()
