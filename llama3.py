"""CLI driver — byte-compatible with the reference's `python llama3.py "prompt"`.

Reproduces the reference driver's observable behavior (reference
llama3.py:324-349): default prompt "I have a dream", hardcoded
./tokenizer.model.np and ./stories15M.model.npz paths, per-token streamed
decode (including the decode-strip quirk Q3), stop on eos *or* bos (quirk Q6),
`max_new_tokens` as a total-length bound (quirk Q2), and the final
"Token count: N, elapsed: S, T tokens/s" line — but the model underneath is
the jitted TPU engine, so the whole generation is one fused device program.

Importing this module also re-exports the reference's module-level API
(softmax, silu, compute_cos_sin_cache, apply_rotary_emb, Llama, ...) backed by
the framework, so `import llama3` call sites keep working.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from llama3np_tpu import ModelArgs, Tokenizer
from llama3np_tpu.models.llama import Llama
from llama3np_tpu.reference_numpy import (
    softmax_np as softmax,
    silu_np as silu,
    rmsnorm_np,
    rope_tables_np,
    apply_rope_np,
)


def compute_cos_sin_cache(head_dim: int, max_seq_len: int, base: int = 10000):
    """Reference-compatible free function (reference llama3.py:31-38)."""
    return rope_tables_np(head_dim, max_seq_len, float(base), np.float64)


def apply_rotary_emb(xq, xk, freqs_cos, freqs_sin):
    """Reference-compatible free function (reference llama3.py:41-76)."""
    return (
        apply_rope_np(xq, freqs_cos, freqs_sin),
        apply_rope_np(xk, freqs_cos, freqs_sin),
    )


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    args = ModelArgs()

    tokenizer = Tokenizer("./tokenizer.model.np")
    model = Llama("./stories15M.model.npz", args)

    prompt = argv[1] if len(argv) > 1 else "I have a dream"

    print(f"\n{prompt}", end="")
    input_ids = np.array([tokenizer.encode(prompt)])
    start = time.time()
    _, L = input_ids.shape
    for token in model.generate(input_ids, args.max_new_tokens):
        L += 1
        output_id = token[0].tolist()
        if output_id[-1] in [tokenizer.eos_id, tokenizer.bos_id]:
            break
        print(tokenizer.decode(output_id), end="")
        sys.stdout.flush()
    elapsed = time.time() - start
    print(
        f"\n\nToken count: {L}, elapsed: {elapsed:.2f}s, {round(L / elapsed)} tokens/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
