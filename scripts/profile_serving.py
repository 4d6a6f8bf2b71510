#!/usr/bin/env python
"""Profile the serving ragged-decode step at 2-layer llama3-8b widths and
decompose where the full-8B serving step's time goes (the B=8 32L step
measured 44.6 ms vs a ~12 ms parameter-bytes floor — scripts/serve8b.py).

Variants isolate the suspects: int8 vs bf16 weights, int8 vs bf16 KV
pools, Pallas page-streaming kernel vs XLA gather.  Each run profiles 3
step(quantum=4) calls via jax.profiler and aggregates device-op time from
the trace (the round-2 methodology).

Run on the real chip:  python scripts/profile_serving.py
"""

import collections
import glob
import gzip
import json
import shutil
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def profile_steps(be, quantum, trace_dir):
    import jax

    for _ in range(3):
        be.step(quantum=quantum)  # warm + compile
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            be.step(quantum=quantum)
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names, procs = {}, {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"]["name"]
    agg, cnt = collections.Counter(), collections.Counter()
    total = 0
    for e in tr["traceEvents"]:
        # Device ops live under process "/device:TPU:N" — older traces named
        # the THREAD with "TPU", newer ones call it "XLA Ops"; accept both.
        # (Some metadata/counter events carry no tid at all.)
        tname = str(names.get((e.get("pid"), e.get("tid")), ""))
        on_device = "TPU" in tname or (
            "TPU" in str(procs.get(e.get("pid"), "")) and tname == "XLA Ops")
        if e.get("ph") == "X" and on_device:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            total += e.get("dur", 0)
    return agg, cnt, total


def run_variant(label, engine_args, kv_quant, num_pages, top=8):
    import jax  # noqa: F401
    from llama3np_tpu import synthetic_weights
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.serving import BatchEngine

    weights = synthetic_weights(engine_args, seed=0)
    engine = Llama(weights, engine_args)
    del weights
    be = BatchEngine(engine, capacity=8, paged=True, page_size=32,
                     num_pages=num_pages, kv_quant=kv_quant)
    rng = np.random.default_rng(0)
    for i in range(8):
        be.submit(rng.integers(10, engine_args.vocab_size,
                               size=int(200 + 230 * i)).tolist(),
                  max_new_tokens=512, stop_ids=())

    agg, cnt, total = profile_steps(be, 4, "/tmp/trace_serv")
    # 3 dispatches x 4 inner steps
    print(f"\n=== {label}: device total {total/1e3/12:.2f} ms/step ===",
          flush=True)
    for n, d in agg.most_common(top):
        print(f"  {d/1e3/12:8.3f} ms x{cnt[n]:4d} {n[:64]}", flush=True)
    del be, engine
    import gc
    gc.collect()


def main():
    import jax
    from llama3np_tpu import preset

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    base = dict(n_layers=2, max_seq_len=8192, dtype="bfloat16",
                fuse_matmuls=False)
    pages = 1 + 8 * (8192 // 32)
    run_variant("int8 w / int8 kv / pallas paged",
                preset("llama3-8b", quant="int8", **base), "int8", pages)
    run_variant("int8 w / bf16 kv / pallas paged",
                preset("llama3-8b", quant="int8", **base), None, pages)
    run_variant("bf16 w / bf16 kv / pallas paged",
                preset("llama3-8b", **base), None, pages)
    run_variant("int8 w / int8 kv / XLA gather",
                preset("llama3-8b", quant="int8", attn_impl="xla", **base),
                "int8", pages)


if __name__ == "__main__":
    main()
