#!/usr/bin/env python
"""Full-scale llama3-8b serving run — BASELINE config 4 end-to-end.

The round-2 serving numbers were 2-layer-width proxies; this runs the FULL
32-layer llama3-8b (vocab 128,256, 8K context) under the paged BatchEngine
on one 16 GB chip:

  * int8 weight-only quantization (8.07 GB on device),
  * int8 KV cache (kv_quant) — the capacity prerequisite: bf16 KV at 8K
    context is ~1.07 GB/sequence (2 x 32L x 8KVH x 128HD x 8192 x 2B);
    capacity 8 would need ~8.6 GB of cache on top of the weights.  int8
    halves it (+1/128 scale overhead): ~0.54 GB/sequence worst case,
  * page-streaming Pallas paged-attention kernel (page_size 32 — the int8
    sublane tile),
  * chunked admission (512-token chunks) — long prompts admit without
    stalling co-tenants, and the engine never compiles an 8K prefill
    bucket.

Mixed workload: prompts 64..7800 tokens, budgets 48..192, capacity 8,
quantum 8.  Prints aggregate tok/s, per-step marginal device time, and the
capacity arithmetic.  Run on the real chip (honors
JAX_COMPILATION_CACHE_DIR; first run pays remote compiles).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import argparse
    import jax
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.kvcache import cache_nbytes
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.serving import BatchEngine

    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=8)
    ap.add_argument("--num-pages", type=int, default=1040)
    ap.add_argument("--quantum", type=int, default=8)
    ap.add_argument("--max-prompt", type=int, default=7800,
                    help="longest mixed-workload prompt (capacity 16 runs "
                         "cap this so worst-case reservations fit the pool)")
    ap.add_argument("--quant", default="int8", choices=["int8", "int4"],
                    help="weight quantization (int4: ~4.2 GB weights, "
                         "weight-stream floor halves again)")
    cli = ap.parse_args()
    capacity = cli.capacity
    # Page 64: one kernel DMA moves [KVH, page, HD] — 64 KB at page 64 vs
    # 32 KB at page 32, and the measured realized bandwidth jumps 395 ->
    # ~800 GB/s (streaming peak) because per-DMA issue cost stops dominating
    # (scripts/probe_paged_chunk.py, round 4).  int8 sublane tile needs
    # page >= 32; 64 satisfies it with margin.
    page_size = 64
    quantum = cli.quantum
    args = preset("llama3-8b", quant=cli.quant, fuse_matmuls=False,
                  kv_quant="int8")

    # Boot from a cached quantized checkpoint when present (the ~19 min host
    # generate+quantize of 32 GB fp32 runs once; retries take seconds of IO).
    import os
    ckpt = ("/tmp/llama3_8b_int4h8.npz" if cli.quant == "int4"
            else f"/tmp/llama3_8b_{cli.quant}.npz")
    t0 = time.perf_counter()
    if not os.path.exists(ckpt):
        print("generating synthetic llama3-8b weights...", flush=True)
        weights = synthetic_weights(args, seed=0)
        t1 = time.perf_counter()
        print(f"  {t1 - t0:.0f}s; quantizing + saving {cli.quant} "
              f"checkpoint...", flush=True)
        from llama3np_tpu.checkpoint import (build_param_tree,
                                             permute_rope_layout,
                                             quantize_param_tree,
                                             save_quantized_npz)
        # int4 trees keep the 2-D head/embedding leaves at int8: s4 layout
        # preferences for those vary by batch shape on this backend and a
        # committed array cannot relayout (BENCHMARKS round-5 envelope
        # note); the layer-weight stream — the bytes that matter — is int4.
        tree = quantize_param_tree(
            permute_rope_layout(build_param_tree(weights, args), args),
            bits=4 if cli.quant == "int4" else 8,
            head_bits=8)
        save_quantized_npz(tree, ckpt)
        del weights, tree
        print(f"  {time.perf_counter() - t1:.0f}s transform+save", flush=True)
    t1 = time.perf_counter()
    engine = Llama.from_quantized(ckpt, args)
    t2 = time.perf_counter()
    print(f"  {t2 - t1:.0f}s int8-checkpoint boot", flush=True)

    import jax.numpy as jnp
    wbytes = sum(x.size // 2 if x.dtype == jnp.int4
                 else x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(engine.params))
    bf16_kv = cache_nbytes(args.replace(kv_dtype="bfloat16"), 1)
    int8_kv = cache_nbytes(args, 1, quant="int8")
    # Pool sizing, round 4: the deferred-commit quantum scan keeps the pool
    # loop-INVARIANT (models/llama.py ragged_decode_steps), so the 2 x
    # 1.34 GB in-loop double-buffer temp of the old pool carry is gone and
    # the worst case FITS: capacity 8 x 8K = 1025 pages at page 64 (4.43 GB
    # + weights 8.04 + the 1.07 GB admission row temp = ~13.6 GB of 15.75).
    # Every sequence's full-context reservation is now physically backed —
    # the admission backpressure only queues above capacity, never above
    # memory.  Capacity 16 (round 5, after the layout-copy fixes freed the
    # 2.2 GB relayout temp) runs the shared-budget posture instead: pool >
    # sum of expected lengths but < 16 x 8K, reservation backpressure
    # queues the tail (--num-pages 1180 --max-prompt 3500).
    num_pages = cli.num_pages
    pool_bytes = num_pages * 2 * args.n_layers * args.kv_heads * page_size * (
        args.head_dim + 4)
    print(f"weights on device: {wbytes / 1e9:.2f} GB int8\n"
          f"KV per full 8K sequence: bf16 {bf16_kv / 1e9:.2f} GB -> "
          f"int8 {int8_kv / 1e9:.2f} GB\n"
          f"pool: {num_pages} pages x 32 tok = "
          f"{pool_bytes / 1e9:.2f} GB (capacity {capacity} worst-case)",
          flush=True)

    be = BatchEngine(engine, capacity=capacity, paged=True,
                     page_size=page_size, num_pages=num_pages,
                     kv_quant="int8", admit_chunk=512)

    rng = np.random.default_rng(7)
    lengths = [64, 300, 800, 1500, 2500, 4000, 6000, 7800,
               128, 640, 1200, 3000]
    budgets = [48, 96, 192, 64, 96, 48, 64, 96, 192, 64, 48, 96]
    if capacity > 8:  # scale the workload with the slot count
        lengths = lengths + lengths[:capacity - 8]
        budgets = budgets + budgets[:capacity - 8]
    lengths = [min(n, cli.max_prompt) for n in lengths]
    reqs = []

    print("admitting + serving...", flush=True)
    t3 = time.perf_counter()
    for L, budget in zip(lengths, budgets):
        prompt = rng.integers(10, args.vocab_size, size=L).tolist()
        reqs.append(be.submit(prompt, max_new_tokens=budget, stop_ids=()))
    steps = 0
    while any(not r.done for r in reqs) or be._queue:
        be.step(quantum=quantum)
        steps += 1
        if steps > 2000:
            raise RuntimeError("did not converge")
    t4 = time.perf_counter()
    total_tokens = sum(len(r.generated) for r in reqs)
    print(f"served {len(reqs)} requests, {total_tokens} tokens in "
          f"{t4 - t3:.1f}s ({steps} steps, quantum {quantum}) -> "
          f"aggregate {total_tokens / (t4 - t3):,.0f} tok/s wall "
          f"(incl. admissions + ~24 ms/dispatch tunnel)", flush=True)

    # Marginal per-step device time at full occupancy: refill all slots,
    # then time quantum=16 vs quantum=4 scans (tunnel + host cost cancels).
    print("marginal step timing at full occupancy...", flush=True)
    reqs2 = []
    for i in range(capacity):
        step_len = 500 if capacity <= 8 else 3500 // capacity
        n = min(1000 + step_len * i, cli.max_prompt)
        prompt = rng.integers(10, args.vocab_size, size=n).tolist()
        # Budget 256 keeps every slot active through the timed quanta while
        # the worst-case reservations fit the pool.
        reqs2.append(be.submit(prompt, max_new_tokens=256, stop_ids=()))
    times = {}
    for q in (4, 16):
        be.step(quantum=q)  # compile
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            be.step(quantum=q)
            best = min(best, time.perf_counter() - t)
        times[q] = best
    per_step = (times[16] - times[4]) / 12
    agg = capacity / per_step
    print(f"per-ragged-step device time (B={capacity}, 32L, int8 KV, "
          f"paged kernel): {per_step * 1e3:.2f} ms -> "
          f"{agg:,.0f} tok/s aggregate device-side", flush=True)
    print(json_line(total_tokens / (t4 - t3), per_step, agg))


def json_line(wall_aggregate, per_step, device_aggregate):
    import json
    return json.dumps({
        "metric": "llama3-8b_full32L_int8w_int8kv_paged_serving",
        "wall_aggregate_tok_s": round(wall_aggregate, 1),
        "per_step_ms": round(per_step * 1e3, 3),
        "device_aggregate_tok_s": round(device_aggregate, 1),
    })


if __name__ == "__main__":
    main()
