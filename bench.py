#!/usr/bin/env python
"""Headline benchmark: stories15M greedy decode throughput on the default JAX
device (the real TPU chip under the driver; CPU when forced).

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline is measured against the reference's README headline of 33 tokens/s
(reference README.md:20; see BASELINE.md).  Weights are synthetic at exactly
the stories15M shape (the real stories15M.model.npz blob is absent from this
environment; throughput is weight-value independent) unless a real
``./stories15M.model.npz`` exists, in which case it is used.  Greedy parity
vs the NumPy oracle on the same weights is a HARD gate: divergence or a
parity-check error exits nonzero with NO JSON line, so a published number
always reflects a correct model.

Env knobs (testing the gate itself): BENCH_DECODE_TOKENS overrides the scan
length; BENCH_CORRUPT=1 perturbs one weight after the oracle is built, which
must make the gate fail.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_TOKS = 33.0  # reference README.md:20
# Single-scan decode length.  One scan = one dispatch; the published number
# is wall time INCLUDING the ~24 ms dev-tunnel dispatch, so longer scans
# amortize it toward the ~34k tok/s device-side rate (chained segments do
# NOT pipeline through the tunnel — measured round 4, scripts/
# headline_sweep.py: each extra dispatch costs ~23 ms).  1000 tokens fits
# the M=1024 cache bound after the 5-token prompt.
DECODE_TOKENS = 1000
PROMPT = [1, 76, 505, 263, 12561]  # "I have a dream" (reference tokenizer)


def _honor_platform_env():
    """The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS=cpu; undo
    it when the env var explicitly asks for cpu (CI tests the parity gate on
    the virtual backend)."""
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return
    import jax

    if jax.config.jax_platforms != "cpu":
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
        jax.config.update("jax_platforms", "cpu")


def main():
    _honor_platform_env()
    from llama3np_tpu import preset, synthetic_weights, build_param_tree, NumpyLlama
    from llama3np_tpu.models.llama import Llama
    import jax

    args = preset("stories15M", max_seq_len=1024, decode_token_unroll=8)
    if os.path.exists("stories15M.model.npz"):
        weights = dict(np.load("stories15M.model.npz"))
        print("bench: using real ./stories15M.model.npz weights", file=sys.stderr)
    else:
        weights = synthetic_weights(args, seed=0)
        print("bench: real checkpoint absent; synthetic stories15M-shaped "
              "weights (throughput is weight-value independent)", file=sys.stderr)
    engine = Llama(weights, args)
    gen_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", DECODE_TOKENS))
    ids = np.array([PROMPT], np.int32)

    # --- parity gate (greedy stream vs NumPy oracle) -----------------------
    # HARD gate: any divergence or parity-check error means no JSON line and
    # a nonzero exit — a published throughput number implies a correct model.
    oracle = NumpyLlama(build_param_tree(weights, args), args)
    if os.environ.get("BENCH_CORRUPT"):  # self-test hook for the gate
        engine.params["layers"]["wo"] = (
            engine.params["layers"]["wo"].at[0].multiply(-1.0)
        )
    n_check = 32
    got = np.asarray(engine.generate_tokens(ids, n_check))[0].tolist()
    want = []
    for t in oracle.generate(ids, n_check + ids.shape[1]):
        want.append(int(t[0, -1]))
        if len(want) == n_check:
            break
    if got != want:
        diverge = next(
            (i for i, (a, b) in enumerate(zip(got, want)) if a != b), None
        )
        print(f"bench: FATAL greedy divergence vs NumPy oracle at "
              f"token {diverge}: {got[:8]} vs {want[:8]}", file=sys.stderr)
        sys.exit(1)
    print(f"bench: greedy parity OK ({n_check} tokens)", file=sys.stderr)

    # --- warmup (compile prefill + decode buckets) -------------------------
    gen = engine._gen
    prompt_ids = np.zeros((1, 16), np.int32)  # real prompt, bucket-padded
    prompt_ids[0, : len(PROMPT)] = PROMPT
    cache = engine.init_cache(1)
    tok0, cache = gen._prefill(engine.params, prompt_ids,
                               np.int32(len(PROMPT)), cache, engine.cos, engine.sin)
    decode = gen.decode_fn(gen_tokens, 1)
    toks, cache2 = decode(engine.params, tok0, np.int32(len(PROMPT)), cache,
                          engine.cos, engine.sin)
    np.asarray(toks)

    # --- timed: prefill ----------------------------------------------------
    prefill_times = []
    for _ in range(10):
        cache = engine.init_cache(1)
        np.asarray(cache["k"][0, 0, 0, :1])
        t0 = time.perf_counter()
        tok0, cache = gen._prefill(engine.params, prompt_ids,
                                   np.int32(len(PROMPT)), cache,
                                   engine.cos, engine.sin)
        np.asarray(tok0)  # host transfer: reliable sync on this platform
        prefill_times.append(time.perf_counter() - t0)
    prefill_ms = min(prefill_times) * 1e3

    # --- timed: decode -----------------------------------------------------
    rates = []
    for _ in range(5):
        cache = engine.init_cache(1)
        tok0, cache = gen._prefill(engine.params, prompt_ids,
                                   np.int32(len(PROMPT)), cache,
                                   engine.cos, engine.sin)
        np.asarray(tok0)
        t0 = time.perf_counter()
        toks, cache = decode(engine.params, tok0, np.int32(len(PROMPT)), cache,
                             engine.cos, engine.sin)
        np.asarray(toks)  # host transfer: reliable sync on this platform
        dt = time.perf_counter() - t0
        rates.append(gen_tokens / dt)
    value = max(rates)

    print(f"bench: prefill {prefill_ms:.2f} ms, decode "
          f"{[f'{r:.0f}' for r in rates]} tok/s on {jax.devices()[0]}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "stories15M_greedy_decode",
        "value": round(value, 1),
        "unit": "tokens/s",
        "vs_baseline": round(value / BASELINE_TOKS, 2),
    }))


if __name__ == "__main__":
    main()
