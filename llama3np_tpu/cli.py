"""Extended CLI: `python -m llama3np_tpu.cli [options] "prompt"`.

The byte-compatible reference driver lives at the repo root (`llama3.py`,
mirroring reference llama3.py:324-349 with hardcoded paths).  This module is
the framework-native driver: model/tokenizer paths, presets, dtype, kernel
selection, token budget, phase stats, profiler traces, and the debug
tensor-stats trace (the reference debug builds' capability, SURVEY §5).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llama3np_tpu",
                                description="TPU-native Llama inference")
    p.add_argument("prompt", nargs="?", default="I have a dream")
    p.add_argument("--model", default="./stories15M.model.npz",
                   help=".npz checkpoint (reference schema)")
    p.add_argument("--tokenizer", default="./tokenizer.model.np")
    p.add_argument("--preset", default="stories15M",
                   help="config preset (stories15M, stories110M, "
                        "tinyllama-1.1b, llama3-8b, llama3-70b)")
    p.add_argument("--max-new-tokens", type=int, default=None,
                   help="number of NEW tokens (default: preset budget)")
    p.add_argument("--dtype", default=None,
                   choices=[None, "float32", "bfloat16", "float16"])
    p.add_argument("--attn-impl", default=None, choices=[None, "auto", "xla", "pallas"])
    p.add_argument("--quant", default=None, choices=[None, "int8", "int4"],
                   help="weight-only quantization (int8 per-output-channel "
                        "scales; fits llama3-8b on one 16 GB chip)")
    p.add_argument("--precision", default=None, choices=[None, "default", "highest"])
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature (0 = greedy, the reference behavior)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fixed-decode", action="store_true",
                   help="correct decode (disable the reference's strip quirk Q3)")
    p.add_argument("--no-stream", action="store_true")
    p.add_argument("--stats-json", action="store_true",
                   help="print a JSON stats line at the end")
    p.add_argument("--trace", metavar="LOGDIR", default=None,
                   help="capture a jax.profiler trace of the generation")
    p.add_argument("--debug-stats", action="store_true",
                   help="one-shot per-op tensor-stats trace of the forward")
    p.add_argument("--debug-log-dir", default=None, metavar="DIR",
                   help="also write the per-op tensor-stats trace to a "
                        "rotating debug log in DIR (reference debug-build "
                        "sink, debug/debug_llama3.py:31-50); implies the "
                        "trace itself")
    p.add_argument("--debug-tokens", type=int, default=0, metavar="N",
                   help="with --debug-stats/--debug-log-dir: eager-replay N "
                        "generated tokens, logging every checkpoint per "
                        "forward (the reference debug build's whole-"
                        "generation logging) instead of one forward")
    p.add_argument("--run-log", default=None, metavar="PATH",
                   help="append a JSONL record of this run")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic weights (no checkpoint file needed)")
    return p


def main(argv=None) -> int:
    from . import preset, synthetic_weights, Tokenizer
    from .models.llama import Llama
    from .observability import timed_generate, trace, debug_trace_forward, RunLog

    args_ns = build_parser().parse_args(argv)
    overrides = {}
    if args_ns.dtype:
        overrides["dtype"] = args_ns.dtype
    if args_ns.attn_impl:
        overrides["attn_impl"] = args_ns.attn_impl
    if args_ns.quant:
        overrides["quant"] = args_ns.quant
    margs = preset(args_ns.preset, **overrides)

    tokenizer = Tokenizer(args_ns.tokenizer, fix_decode=args_ns.fixed_decode)
    source = (synthetic_weights(margs, seed=0) if args_ns.synthetic
              else args_ns.model)
    model = Llama(source, margs, precision=args_ns.precision)

    ids = np.array([tokenizer.encode(args_ns.prompt)])
    n_new = args_ns.max_new_tokens
    if n_new is None:
        n_new = max(margs.max_new_tokens - ids.shape[1], 0)
    n_new = min(n_new, margs.max_seq_len - ids.shape[1])

    if args_ns.debug_stats or args_ns.debug_log_dir:
        sinks = []
        if args_ns.debug_stats:
            sinks.append(lambda s: print(s, file=sys.stderr))
        if args_ns.debug_log_dir:
            from .observability import make_debug_logger
            sinks.append(make_debug_logger(args_ns.debug_log_dir).debug)
        emit = lambda s: [sink(s) for sink in sinks]  # noqa: E731
        if args_ns.debug_tokens > 0:
            from .observability import debug_trace_generate
            debug_trace_generate(model, ids, args_ns.debug_tokens, emit=emit)
        else:
            debug_trace_forward(model, ids, 0, emit=emit)
        model.reset()

    print(f"\n{args_ns.prompt}", end="")
    ctx = trace(args_ns.trace) if args_ns.trace else _null_ctx()
    with ctx:
        if args_ns.temperature > 0:
            import time as _time
            from .generate import Sampling
            from .observability import GenerationStats
            policy = Sampling(temperature=args_ns.temperature,
                              top_k=args_ns.top_k, top_p=args_ns.top_p,
                              seed=args_ns.seed)
            t0 = _time.perf_counter()
            toks = model.generate_tokens(ids, n_new, sampling=policy)
            toks = np.asarray(toks)
            stats = GenerationStats(prompt_tokens=ids.shape[1],
                                    generated_tokens=n_new,
                                    decode_s=_time.perf_counter() - t0)
        else:
            toks, stats = timed_generate(model, ids, n_new)
    toks = np.asarray(toks)[0]

    emitted = 0
    for t in toks.tolist():
        if t in (tokenizer.eos_id, tokenizer.bos_id):
            break
        emitted += 1
        if not args_ns.no_stream:
            print(tokenizer.decode([t]), end="")
            sys.stdout.flush()
    total = ids.shape[1] + emitted
    elapsed = stats.prefill_s + stats.decode_s
    print(f"\n\nToken count: {total}, elapsed: {elapsed:.2f}s, "
          f"{round(total / elapsed) if elapsed else 0} tokens/s")
    print(f"prefill: {stats.prefill_ms:.2f} ms | "
          f"decode: {stats.decode_tok_s:.1f} tokens/s", file=sys.stderr)
    if args_ns.stats_json:
        print(json.dumps(stats.to_dict()))
    if args_ns.run_log:
        RunLog(args_ns.run_log).append(
            {"prompt": args_ns.prompt, "preset": args_ns.preset,
             **stats.to_dict()}
        )
    return 0


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    sys.exit(main())
