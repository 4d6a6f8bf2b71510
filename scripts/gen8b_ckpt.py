#!/usr/bin/env python
"""Generate + quantize the synthetic llama3-8b int8 checkpoint used by
scripts/serve8b.py, on CPU only (safe to run alongside a TPU process —
the tunnel is single-process)."""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CKPT = "/tmp/llama3_8b_int8.npz"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.checkpoint import (build_param_tree,
                                         permute_rope_layout,
                                         quantize_param_tree,
                                         save_quantized_npz)

    if os.path.exists(CKPT):
        print(f"{CKPT} already exists", flush=True)
        return
    args = preset("llama3-8b", quant="int8", fuse_matmuls=False,
                  kv_quant="int8")
    t0 = time.perf_counter()
    print("generating synthetic llama3-8b weights...", flush=True)
    weights = synthetic_weights(args, seed=0)
    t1 = time.perf_counter()
    print(f"  {t1 - t0:.0f}s; transform + quantize + save...", flush=True)
    tree = quantize_param_tree(
        permute_rope_layout(build_param_tree(weights, args), args))
    save_quantized_npz(tree, CKPT)
    print(f"  {time.perf_counter() - t1:.0f}s transform+save -> {CKPT}",
          flush=True)


if __name__ == "__main__":
    main()
