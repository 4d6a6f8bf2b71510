#!/usr/bin/env python
"""Sweep the stories15M headline decode configuration on the real chip.

Questions this answers (round 4):
  1. Marginal device-side rate today (256 vs 768 scan, tunnel cancelled) —
     does it still match round-2's 36.8k tok/s fp32 at M=1024 / unroll 4?
  2. Does token_unroll 8/16 beat 4?
  3. What does M=2048 cost per token (the fused kernel reads full-M cache
     blocks regardless of pos)?
  4. Do CHAINED scan segments pipeline through the tunnel?  jax dispatch is
     async; if the host can enqueue segment k+1 while k runs, an N-token
     generation pays ~one roundtrip total and the headline approaches the
     device rate without a single giant scan.

Run on the real chip: python scripts/headline_sweep.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PROMPT = [1, 76, 505, 263, 12561]


def setup(max_seq_len, unroll, dtype="float32"):
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.models.llama import Llama

    from llama3np_tpu.generate import Generator

    args = preset("stories15M", max_seq_len=max_seq_len,
                  decode_token_unroll=unroll, dtype=dtype)
    engine = Llama(synthetic_weights(args, seed=0), args)
    engine._gen = Generator(engine)
    return engine


def timed_decode(engine, n, repeats=4):
    """Wall time of one prefill-excluded n-token decode (single scan)."""
    gen = engine._gen
    prompt_ids = np.zeros((1, 16), np.int32)
    prompt_ids[0, : len(PROMPT)] = PROMPT
    decode = gen.decode_fn(n, 1)
    best = 1e9
    for _ in range(repeats + 1):
        cache = engine.init_cache(1)
        tok0, cache = gen._prefill(engine.params, prompt_ids, np.int32(5),
                                   cache, engine.cos, engine.sin)
        np.asarray(tok0)
        t0 = time.perf_counter()
        toks, cache = decode(engine.params, tok0, np.int32(5), cache,
                             engine.cos, engine.sin)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)  # first rep is warmup
    return best


def timed_chained(engine, segments, repeats=4):
    """Wall time of a chained multi-segment decode (no host sync between)."""
    gen = engine._gen
    prompt_ids = np.zeros((1, 16), np.int32)
    prompt_ids[0, : len(PROMPT)] = PROMPT
    fns = [gen.decode_fn(s, 1) for s in segments]
    best = 1e9
    for _ in range(repeats + 1):
        cache = engine.init_cache(1)
        tok0, cache = gen._prefill(engine.params, prompt_ids, np.int32(5),
                                   cache, engine.cos, engine.sin)
        np.asarray(tok0)
        t0 = time.perf_counter()
        tok, pos = tok0, 5
        outs = []
        for fn, s in zip(fns, segments):
            toks, cache = fn(engine.params, tok, np.int32(pos), cache,
                             engine.cos, engine.sin)
            outs.append(toks)
            tok, pos = toks[:, -1], pos + s
        for o in outs:
            np.asarray(o)
        best = min(best, time.perf_counter() - t0)
    return best


def report(label, n, t):
    print(f"{label:44s} {n:5d} tok  {t * 1e3:8.2f} ms  "
          f"{n / t:10,.0f} tok/s", flush=True)


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)

    # -- 1/2: marginal device rate + unroll sweep at M=1024 ------------------
    for unroll in (4, 8):
        eng = setup(1024, unroll)
        t256 = timed_decode(eng, 256)
        t768 = timed_decode(eng, 768)
        marg = (t768 - t256) / 512
        print(f"M=1024 unroll={unroll}: marginal {marg * 1e6:.1f} us/tok "
              f"({1 / marg:,.0f} tok/s device-side); "
              f"dispatch ~{(t256 - 256 * marg) * 1e3:.1f} ms", flush=True)
        report(f"  single-scan n=512 (headline config u{unroll})", 512,
               timed_decode(eng, 512))
        report(f"  single-scan n=1000 u{unroll}", 1000,
               timed_decode(eng, 1000))
        del eng

    # -- 4: chained-segment pipelining at M=1024 -----------------------------
    eng = setup(1024, 4)
    report("  chained 2x512=1000 (512+488->512 pad)", 1000,
           timed_chained(eng, [512, 488 // 4 * 4]))
    report("  chained 512+256+128+64+32 = 992", 992,
           timed_chained(eng, [512, 256, 128, 64, 32]))
    del eng

    # -- 3: M=2048 ------------------------------------------------------------
    eng = setup(2048, 4)
    t512 = timed_decode(eng, 512)
    t1536 = timed_decode(eng, 1536)
    marg = (t1536 - t512) / 1024
    print(f"M=2048 unroll=4: marginal {marg * 1e6:.1f} us/tok "
          f"({1 / marg:,.0f} tok/s device-side)", flush=True)
    report("  single-scan n=2000 M=2048", 2000, timed_decode(eng, 2000))
    del eng


if __name__ == "__main__":
    main()
