"""Functional-API driver — call-compatible with the reference's functional
twin (reference llama3_simple.py): `llama_init(path, args) -> model dict`,
`llama_forward(model, ids, start_pos) -> [B, 1, VS] logits`,
`llama_generate(model, ids, max_new_tokens)` yielding [B, 1] ids (its count
semantics: up to `max_new_tokens` NEW tokens, capped at max_seq_len —
reference llama3_simple.py:268-285), and the same CLI
(`python llama3_simple.py "prompt"`, default "Once upon a time", dtype banner,
stats line — reference llama3_simple.py:289-314).

Backed by the jitted TPU engine rather than op-by-op NumPy; the model "dict"
keeps the functional shape (state threaded explicitly).
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
    rmsnorm_np as rmsnorm,
    rope_tables_np,
    apply_rope_np,
)


def compute_cos_sin_cache(head_dim, max_seq_len, base=10000, dtype=np.float32):
    return rope_tables_np(head_dim, max_seq_len, float(base), dtype)


def apply_rotary_emb(xq, xk, freqs_cos, freqs_sin):
    return (apply_rope_np(xq, freqs_cos, freqs_sin),
            apply_rope_np(xk, freqs_cos, freqs_sin))


def llama_init(model_path: str, args: ModelArgs) -> dict:
    """Build the functional model dict (reference llama3_simple.py:208-265)."""
    engine = Llama(model_path, args)
    return {"args": args, "dtype": np.dtype(args.dtype), "engine": engine}


def llama_forward(model: dict, input_ids, start_pos: int):
    """Forward at `start_pos`; returns last-position logits [B, 1, VS]."""
    return model["engine"](input_ids, start_pos)


def llama_generate(model: dict, input_ids, max_new_tokens: int):
    """Yield [B, 1] greedy tokens, up to `max_new_tokens`, stopping when the
    total length reaches max_seq_len (reference llama3_simple.py:268-285)."""
    args = model["args"]
    ids = np.asarray(input_ids)
    B, L = ids.shape
    steps = max(min(max_new_tokens, args.max_seq_len - L), 0)
    if steps == 0:
        return
    toks = model["engine"].generate_tokens(ids, steps)
    for t in np.asarray(toks).T:
        yield t[:, None].astype(np.int32)


if __name__ == "__main__":
    args = ModelArgs()
    print(f"Using precision: {args.dtype}")
    tokenizer = Tokenizer("./tokenizer.model.np")
    model = llama_init("./stories15M.model.npz", args)

    prompt = sys.argv[1] if len(sys.argv) > 1 else "Once upon a time"
    print(f"\n{prompt}", end="")
    input_ids = np.array([tokenizer.encode(prompt)])
    start = time.time()
    _, seq_len = input_ids.shape
    for id_val in llama_generate(model, input_ids, args.max_new_tokens):
        seq_len += 1
        output_id = id_val[0].tolist()
        if output_id[-1] in [tokenizer.eos_id, tokenizer.bos_id]:
            break
        print(tokenizer.decode(output_id), end="", flush=True)
    elapsed = time.time() - start
    print(
        f"\n\nToken count: {seq_len}, elapsed: {elapsed:.2f}s, {round(seq_len / elapsed)} tokens/s"  # noqa: E501
    )
