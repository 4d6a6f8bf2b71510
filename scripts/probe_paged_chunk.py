"""Tune the page-streaming kernel: DMA chunk depth x page size, 8B shapes.

The round-4 step decomposition (profile_serve8b.py) put the Pallas
paged-attention kernel at ~7.4 ms/step (32 x 0.23 ms) against a ~1.9 ms
KV-byte floor — ~190 GB/s realized vs the 767 GB/s measured streaming peak.
Two candidate levers probed here, scan-marginal (tunnel cancels) at the
serve8b shapes (B=8, int8 pools, KVH 8, HD 128, lengths 1000..4500):

  * chunk depth: pages fetched per pipeline step (2*chunk outstanding DMAs);
  * page size: one DMA moves [KVH, page, HD] — 32 KB at page 32; if per-DMA
    issue cost dominates, fatter pages (64/128 tokens) pay directly.

Usage: python scripts/probe_paged_chunk.py [page:chunk ...]
       default: 32:4 32:8 32:16 32:32 64:8 64:16 128:4 128:8
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from llama3np_tpu.ops import core as ops
from llama3np_tpu.ops.kernels import paged_attention as pk

B, KVH, G, HD = 8, 8, 4, 128
NL = 2                        # stacked pools; we only time layer=1 reads
M = 8192                      # context budget (serve8b)
LENGTHS = np.array([1000, 1500, 2000, 2500, 3000, 3500, 4000, 4500],
                   np.int32)


def run(page, chunk, rng):
    maxp = M // page
    # pool sized to hold all rows' true pages + null page 0
    need = int((((LENGTHS + page - 1) // page)).sum()) + 1
    P = need + 8
    kp = rng.integers(-127, 128, (NL, P, KVH, page, HD)).astype(np.int8)
    vp = rng.integers(-127, 128, (NL, P, KVH, page, HD)).astype(np.int8)
    ksp = (rng.random((NL, P, KVH, page)) * 0.02).astype(np.float32)
    vsp = (rng.random((NL, P, KVH, page)) * 0.02).astype(np.float32)
    bt = np.zeros((B, maxp), np.int32)
    nxt = 1
    for b in range(B):
        npg = (LENGTHS[b] + page - 1) // page
        bt[b, :npg] = np.arange(nxt, nxt + npg)
        nxt += npg
    q = jnp.asarray(rng.standard_normal((B, 1, KVH * G, HD)), jnp.bfloat16)
    ck = jnp.asarray(rng.integers(-127, 128, (B, KVH, HD)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (B, KVH, HD)), jnp.int8)
    cks = jnp.asarray((rng.random((B, KVH)) * 0.02).astype(np.float32))
    cvs = jnp.asarray((rng.random((B, KVH)) * 0.02).astype(np.float32))
    kp, vp = jnp.asarray(kp), jnp.asarray(vp)
    ksp, vsp = jnp.asarray(ksp), jnp.asarray(vsp)
    btj, posj = jnp.asarray(bt), jnp.asarray(LENGTHS)

    pages_read = int(((LENGTHS + page - 1) // page).sum())
    kv_bytes = pages_read * KVH * page * HD * 2      # int8 K+V

    pk.CHUNK = chunk

    def make(n_iters):
        @jax.jit
        def scan_calls(q, kp, vp, bt, pos):
            kr = ops.gather_page_scales_stacked(ksp, 1, bt)
            vr = ops.gather_page_scales_stacked(vsp, 1, bt)

            def body(c, _):
                o = pk.paged_attention(c, kp, vp, bt, pos, layer=1,
                                       k_scale_rows=kr, v_scale_rows=vr,
                                       cur_k=ck, cur_v=cv, cur_ks=cks,
                                       cur_vs=cvs)
                # feed the output back so the scan cannot hoist the call
                return o.astype(c.dtype) * 1e-3 + c, None

            c, _ = jax.lax.scan(body, q, None, length=n_iters)
            return c

        return scan_calls

    def timed(n_iters):
        fn = make(n_iters)
        fn(q, kp, vp, btj, posj).block_until_ready()
        t0 = time.perf_counter()
        fn(q, kp, vp, btj, posj).block_until_ready()
        return time.perf_counter() - t0

    per = (timed(40) - timed(8)) / 32
    bw = kv_bytes / per / 1e9
    print(f"page={page:4d} chunk={chunk:3d}: {per*1e6:8.1f} us/call  "
          f"{kv_bytes/1e6:6.1f} MB -> realized {bw:6.0f} GB/s", flush=True)


def main():
    specs = sys.argv[1:] or ["32:4", "32:8", "32:16", "32:32",
                             "64:8", "64:16", "128:4", "128:8"]
    rng = np.random.default_rng(0)
    for s in specs:
        page, chunk = map(int, s.split(":"))
        run(page, chunk, rng)


if __name__ == "__main__":
    main()
