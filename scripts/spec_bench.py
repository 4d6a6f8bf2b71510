#!/usr/bin/env python
"""Speculative-decoding wall-clock benchmark (quantized self-speculation).

Single-stream decode streams every weight byte per token (roofline.py:
767 GB/s measured peak).  SpeculativeGenerator's int8 self-draft proposes
k tokens at half (vs bf16) or a quarter (vs fp32) of the target's bytes;
the target verifies all k in ONE pass.  Ideal-acceptance speedup bound:
1 / (r + 1/(k+1)) where r = draft/target byte ratio — e.g. bf16 target,
int8 draft, k=8: 1 / (0.5 + 1/9) = 1.64x.

Measures target-only vs speculative wall tok/s (512-token generations
amortize the ~24 ms dispatch) + measured acceptance on:
  * TinyLlama-1.1B bf16 target / int8 self-draft (the roofline config)
  * stories110M fp32 target / int8 self-draft (r = 1/4)

Run on the real chip:  python scripts/spec_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = 512


def wall(fn, reps=3):
    fn()  # compile/warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, args, ks):
    from llama3np_tpu import synthetic_weights
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.speculative import SpeculativeGenerator, quantized_draft

    print(f"\n{name}: building target + int8 self-draft...", flush=True)
    weights = synthetic_weights(args, seed=0)
    target = Llama(weights, args)
    draft = quantized_draft(weights, args)
    del weights
    rng = np.random.default_rng(0)
    ids = rng.integers(10, args.vocab_size, size=(1, 5)).astype(np.int32)

    def solo():
        target.reset()
        return np.asarray(target.generate_tokens(ids, N))

    t_solo = wall(solo)
    base = N / t_solo
    print(f"| {name} | target-only | — | {base:,.0f} tok/s | 1.00x |",
          flush=True)
    want = solo().tolist()
    for k in ks:
        spec = SpeculativeGenerator(target, draft, k=k)
        t = wall(lambda: spec.generate_tokens(ids, N))
        got = spec.generate_tokens(ids, N).tolist()
        tag = "" if got == want else "  [stream differs: near-tie argmax]"
        acc = spec.last_stats["accept_rate"]
        print(f"| {name} | spec k={k} | accept {acc:.2f} | "
              f"{N / t:,.0f} tok/s | {t_solo / t:.2f}x |{tag}", flush=True)


def main():
    import jax
    from llama3np_tpu import preset

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    print("\n| Config | mode | acceptance | throughput | speedup |")
    print("|---|---|---|---|---|", flush=True)
    bench("tinyllama-1.1b bf16",
          preset("tinyllama-1.1b", max_seq_len=1024, dtype="bfloat16"),
          (4, 8))
    bench("stories110M fp32",
          preset("stories110M", max_seq_len=1024), (4, 8))


if __name__ == "__main__":
    main()
