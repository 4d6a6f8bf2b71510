#!/usr/bin/env python
"""Does int4 weight streaming actually halve int8's HBM time on this chip?

XLA:TPU stores s4 packed (2 values/byte); the question is whether the
convert-to-bf16 + scale dequant on the way to the MXU streams at the byte
rate (like int8 does) or pays an unpack penalty.  Measures a loop-carried
matvec (the carry feeds the next input, so the weight re-streams every
iteration — the roofline probe methodology, BENCHMARKS.md round 3) at the
8B FFN shape, marginal over two scan lengths so the ~24 ms tunnel cancels.

Run on the real chip:  python scripts/probe_int4.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

# The weight must EXCEED ~128 MB VMEM at every probed dtype or the loop
# body hoists it on-chip and nothing streams (the stories15M VMEM-residency
# lesson, BENCHMARKS.md round 3; the first run of this probe measured
# "2.6e6 GB/s" on a 59 MB int8 weight for exactly that reason).
D, FD = 4096, 114688  # int4 235 MB / int8 470 MB / bf16 940 MB


def probe(dtype, label):
    import ml_dtypes

    rng = np.random.default_rng(0)
    w8 = rng.integers(-7, 8, size=(D, FD), dtype=np.int8)
    if dtype == jnp.int4:
        # Born packed via a pinned-out-layout jitted convert — this backend
        # cannot relayout a committed array and host uploads are born
        # unpacked (models/llama._device_put_params, same workaround).
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        fmt = Format(Layout(major_to_minor=(0, 1),
                            tiling=((64, 128), (8, 1)),
                            sub_byte_element_size_in_bits=4),
                     SingleDeviceSharding(jax.devices()[0]))
        w = jax.jit(lambda a: a.astype(jnp.int4),
                    out_shardings=fmt)(jnp.asarray(w8))
    else:
        w = jnp.asarray(w8.astype(dtype))
    s = jnp.asarray(rng.random(FD, dtype=np.float32) + 0.5)

    def many(w, s, x0, n):
        def body(x, _):
            y = jnp.dot(x, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) * s
            # Feed the output back so the weight read cannot be hoisted.
            x = jnp.tanh(y[:, :D]).astype(jnp.bfloat16)
            return x, y[0, 0]
        _, out = jax.lax.scan(body, x0, None, length=n)
        return out

    x0 = jnp.ones((1, D), jnp.bfloat16)
    t = {}
    for n in (8, 40):
        fn = jax.jit(lambda w, s, x0, n=n: many(w, s, x0, n))
        np.asarray(fn(w, s, x0))  # compile; np.asarray closes the timing
        best = 1e9               # (block_until_ready is unreliable through
        for _ in range(4):       # the dev tunnel — see prefill_bench)
            t0 = time.perf_counter()
            np.asarray(fn(w, s, x0))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per = (t[40] - t[8]) / 32
    ideal_bytes = D * FD * (0.5 if dtype == jnp.int4 else
                            jnp.dtype(dtype).itemsize)
    print(f"{label}: {per * 1e6:8.1f} us/iter -> "
          f"{ideal_bytes / per / 1e9:6.0f} GB/s at packed-byte accounting "
          f"({ideal_bytes / 1e6:.0f} MB/iter)", flush=True)
    return per


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    t8 = probe(jnp.int8, "int8 [4096,14336]")
    t4 = probe(jnp.int4, "int4 [4096,14336]")
    tb = probe(jnp.bfloat16, "bf16 [4096,14336]")
    print(f"\nint4 vs int8: {t8 / t4:.2f}x faster "
          f"(2.0x = perfect packed streaming); vs bf16 {tb / t4:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
