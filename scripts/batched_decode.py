#!/usr/bin/env python
"""Batched decode throughput + MFU (VERDICT r2 next #4).

Every flagship number so far is batch 1, where an M=1 matvec caps MXU
utilization at a few percent and throughput sits at the HBM roofline
(scripts/roofline.py).  Batching amortizes each weight byte over B rows —
the MFU lever.  This measures dense batched greedy decode at B = 1/8/32 on
the XLA scan path (the Pallas decode layouts are single-stream designs;
whether a batched kernel pays is decided by this data):

  * stories110M bf16 (M=512)
  * llama3-8b widths, 2 layers, int8 (M=2048)
  * full 32-layer llama3-8b int8 at B=8 (16 GB permitting: 8.07 GB weights
    + B x 2048-token bf16 KV)

Marginal per-step timing over two scan lengths (tunnel cancels).  MFU =
B * 2 * P_nonembed * rate_per_row / peak, peak 197 TFLOP/s bf16 (v5e);
int8 weights still multiply in bf16 on the MXU, so the bf16 peak applies.

Run on the real chip:  python scripts/batched_decode.py [--full8b]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PEAK_FLOPS = 197e12  # v5e bf16


def marginal_us(engine, B, lens=(64, 192)):
    from llama3np_tpu.generate import Generator

    if engine._gen is None:
        engine._gen = Generator(engine)
    gen = engine._gen
    fns = {n: gen.decode_fn(n, B) for n in lens}
    ids = np.zeros((B, 16), np.int32)
    ids[:, :5] = [1, 76, 505, 263, 12561]

    def run(n):
        cache = engine.init_cache(B)
        tok0, cache = gen._prefill(engine.params, ids, np.int32(5), cache,
                                   engine.cos, engine.sin)
        toks, _ = fns[n](engine.params, tok0, np.int32(5), cache,
                         engine.cos, engine.sin)
        return toks

    times = {}
    for n in lens:
        np.asarray(run(n))  # warm/compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[lens[1]] - times[lens[0]]) / (lens[1] - lens[0]) * 1e6


def nonembed_params(args):
    d, fd, vs = args.dim, args.hidden_dim, args.vocab_size
    kvd = args.kv_heads * args.head_dim
    per_layer = 2 * d * d + 2 * kvd * d + 3 * d * fd
    return args.n_layers * per_layer + d * vs  # + lm_head matvec


def bench(name, args, batches, ckpt=None):
    """ckpt: optional int8-checkpoint path — if it exists, boot engines with
    Llama.from_quantized (seconds) instead of regenerating + requantizing
    ~32 GB of synthetic weights per batch size (minutes on one host core);
    if given but absent, build once, save, then boot from it."""
    import os

    import dataclasses
    from llama3np_tpu import synthetic_weights
    from llama3np_tpu.checkpoint import save_quantized_npz
    from llama3np_tpu.models.llama import Llama

    weights = None
    if not (ckpt and os.path.exists(ckpt)):
        print(f"\n{name}: generating weights...", flush=True)
        weights = synthetic_weights(args, seed=0)
        if ckpt:
            print(f"  quantizing + saving int8 checkpoint -> {ckpt}",
                  flush=True)
            from llama3np_tpu.checkpoint import (build_param_tree,
                                                 permute_rope_layout,
                                                 quantize_param_tree)
            tree = quantize_param_tree(
                permute_rope_layout(build_param_tree(weights, args), args))
            save_quantized_npz(tree, ckpt)
            del tree, weights
            weights = None
    flops_tok = 2 * nonembed_params(args)
    for B in batches:
        a = dataclasses.replace(args, max_batch_size=B)
        engine = (Llama.from_quantized(ckpt, a) if ckpt
                  else Llama(weights, a))
        us = marginal_us(engine, B)
        step_rate = 1e6 / us               # steps/s
        agg = B * step_rate                # tokens/s aggregate
        mfu = B * flops_tok * step_rate / PEAK_FLOPS
        print(f"| {name} | B={B} | {us:.0f} us/step | {agg:,.0f} tok/s "
              f"| {100*mfu:.1f}% MFU |", flush=True)
        # engine <-> Generator is a reference cycle: break it NOW or the
        # next engine's 8 GB of params coexists with this one's until a gc
        # pass (measured: runtime ResourceExhausted at full-8B B=4).
        import gc
        engine._gen = None
        del engine
        gc.collect()
    del weights


def main():
    import jax

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from llama3np_tpu import preset

    print("\n| Config | batch | per-step | aggregate | MFU |")
    print("|---|---|---|---|---|", flush=True)
    if "--full8b" in sys.argv:
        # Dense bf16 KV at B=8/M=2048 is 17 GB on its own — batched serving
        # at 8B runs on the paged int8 pools (scripts/serve8b.py).  The
        # dense-path MFU datum fits at B=4, M=1024 (2.1 GB cache next to
        # 8.04 GB weights).
        bench("llama3-8b FULL 32L int8 M=1024",
              preset("llama3-8b", max_seq_len=1024, quant="int8",
                     fuse_matmuls=False, dtype="bfloat16"),
              (1, 4), ckpt="/tmp/llama3_8b_int8.npz")
        return
    bench("stories110M bf16 M=512",
          preset("stories110M", max_seq_len=512, dtype="bfloat16"),
          (1, 8, 32))
    bench("llama3-8b-2L int8 M=2048",
          preset("llama3-8b", n_layers=2, max_seq_len=2048, quant="int8",
                 dtype="bfloat16"),
          (1, 8, 32))


if __name__ == "__main__":
    main()
