#!/usr/bin/env python
"""Confirm why batched full-8B int8 decode OOMs: does XLA hoist
loop-invariant int8->bf16 weight converts out of the decode-step scan
(materializing ~16 GB of bf16 weights)?  AOT-compiles the B=4 decode scan
and prints the compiled memory analysis, then repeats with an
optimization_barrier on params inside the scan body."""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def analyze(fn, engine, B, label):
    cache = engine.init_cache(B)
    tok = jnp.zeros((B,), jnp.int32)
    lowered = jax.jit(fn, donate_argnums=(3,)).lower(
        engine.params, tok, jnp.int32(5), cache, engine.cos, engine.sin)
    mem = lowered.compile().memory_analysis()
    print(f"{label}: temp {mem.temp_size_in_bytes/1e9:.2f} GB, "
          f"args {mem.argument_size_in_bytes/1e9:.2f} GB, "
          f"output {mem.output_size_in_bytes/1e9:.2f} GB, "
          f"alias {mem.alias_size_in_bytes/1e9:.2f} GB", flush=True)


def main():
    from llama3np_tpu import preset
    from llama3np_tpu.generate import decode_steps
    from llama3np_tpu.models.llama import Llama, forward

    args = preset("llama3-8b", max_seq_len=1024, quant="int8",
                  fuse_matmuls=False, dtype="bfloat16", max_batch_size=4)
    engine = Llama.from_quantized("/tmp/llama3_8b_int8.npz", args)
    print("engine booted", flush=True)

    plain = partial(decode_steps, cfg=engine.cfg, num_steps=64)
    analyze(plain, engine, 4, "B=4 plain scan")

    def barrier_steps(params, tok, pos, cache, cos, sin):
        def step(carry, _):
            tok, pos, cache = carry
            p = jax.lax.optimization_barrier(params)
            logits, cache = forward(p, tok[:, None], pos, cache, cos, sin,
                                    engine.cfg, first_chunk=False)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt

        (_, _, cache), toks = jax.lax.scan(step, (tok, pos, cache),
                                           length=64)
        return toks.T, cache

    analyze(barrier_steps, engine, 4, "B=4 barrier scan")


if __name__ == "__main__":
    main()
