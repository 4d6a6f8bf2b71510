#!/usr/bin/env python
"""Device-op decomposition of the FULL 32-layer llama3-8b serving step.

scripts/serve8b.py measured 31.8 ms per ragged step (B=8, int8 weights,
int8 KV, paged kernel) after the round-3 loop-invariant-pool restructure —
still ~2.6x the ~12 ms parameter-bytes floor.  This boots the same cached
int8 checkpoint and profiles step(quantum=4) with jax.profiler, printing the
top device ops so the remaining time has names.

Run on the real chip:  python scripts/profile_serve8b.py
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from profile_serving import profile_steps  # noqa: E402


def main():
    import jax
    from llama3np_tpu import preset
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.serving import BatchEngine

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    args = preset("llama3-8b", quant="int8", fuse_matmuls=False,
                  kv_quant="int8")
    ckpt = "/tmp/llama3_8b_int8.npz"
    engine = Llama.from_quantized(ckpt, args)
    be = BatchEngine(engine, capacity=8, paged=True, page_size=64,
                     num_pages=1040, kv_quant="int8", admit_chunk=512)
    rng = np.random.default_rng(7)
    for i in range(8):
        be.submit(rng.integers(10, args.vocab_size,
                               size=int(1000 + 500 * i)).tolist(),
                  max_new_tokens=256, stop_ids=())

    agg, cnt, total = profile_steps(be, 4, "/tmp/trace_serve8b")
    print(f"\n=== full 32L int8w/int8kv/paged: device total "
          f"{total / 1e3 / 12:.2f} ms/step ===", flush=True)
    for n, d in agg.most_common(24):
        print(f"  {d / 1e3 / 12:8.3f} ms x{cnt[n]:5d} {n[:80]}", flush=True)


if __name__ == "__main__":
    main()
