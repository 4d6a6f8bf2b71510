#!/usr/bin/env python
"""Chunked-admission co-tenant latency bound (VERDICT r2 next #6).

Admission of a long prompt used to run one whole-prompt prefill dispatch,
stalling every active stream for the full prefill.  Chunked admission
(serving.BatchEngine admit_chunk) prefills `admit_chunk` tokens at a time
against a temporary row cache and interleaves a co-tenant decode step
between chunks, so the worst-case co-tenant stall is one chunk's prefill,
not one prompt's.

This measures it directly at 2-layer llama3-8b widths (M=8192) on the real
chip: step() completions are timestamped while a ~7.7K-token prompt is
admitted; the max gap between consecutive completions is the worst-case
co-tenant stall.  Compared against the same workload on an unchunked
engine.

Run on the real chip:  python scripts/admission_latency.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LONG = 7700  # admitted prompt length (tokens)
CHUNK = 512


def measure(admit_chunk):
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.serving import BatchEngine

    args = preset("llama3-8b", n_layers=2, max_seq_len=8192,
                  dtype="bfloat16", quant="int8", kv_quant="int8",
                  fuse_matmuls=False)
    engine = Llama(synthetic_weights(args, seed=0), args)
    be = BatchEngine(engine, capacity=4, paged=True, page_size=32,
                     num_pages=1 + 4 * (8192 // 32), kv_quant="int8",
                     admit_chunk=admit_chunk)
    rng = np.random.default_rng(0)

    # Warm every program the measured phase will hit: decode step, chunk
    # prefills (first + non-first), the whole-prompt bucket, the scatter.
    warm = be.submit(rng.integers(10, args.vocab_size, LONG).tolist(),
                     max_new_tokens=4, stop_ids=())
    while not warm.done:
        be.step()

    # Two co-tenants decoding, then admit the long prompt.
    for _ in range(2):
        be.submit(rng.integers(10, args.vocab_size, 64).tolist(),
                  max_new_tokens=2048, stop_ids=())
    for _ in range(4):
        be.step()

    stamps = []
    orig_step = be.step

    def timed_step(quantum=1):
        out = orig_step(quantum)
        stamps.append(time.perf_counter())
        return out

    be.step = timed_step
    t0 = time.perf_counter()
    stamps.append(t0)
    be.submit(rng.integers(10, args.vocab_size, LONG).tolist(),
              max_new_tokens=8, stop_ids=())
    be.step = orig_step
    be.step()  # first post-admission step
    stamps.append(time.perf_counter())
    gaps = np.diff(stamps)
    total = stamps[-1] - t0
    return gaps, total


def main():
    import jax

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    print(f"admitting a {LONG}-token prompt next to 2 decoding co-tenants "
          f"(2-layer llama3-8b widths, int8 w + kv, paged)\n", flush=True)
    for label, chunk in (("whole-prompt admission", None),
                         (f"chunked admission (A={CHUNK})", CHUNK)):
        gaps, total = measure(chunk)
        print(f"{label}: admission total {total*1e3:.0f} ms, "
              f"co-tenant steps during admission: {max(len(gaps)-1, 0)}, "
              f"worst gap between step completions {gaps.max()*1e3:.0f} ms, "
              f"median {np.median(gaps)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
