#!/usr/bin/env python
"""Train a confident stories15M-shaped checkpoint, then settle the two
weight-dependent quality stories (VERDICT r4 next #5).

Synthetic RANDOM weights are an adversarial proxy for both: their logit
distributions are near-uniform, so (a) int8 rounding noise flips greedy
argmaxes constantly — measured speculative self-draft acceptance 0.31-0.63,
below break-even — and (b) perplexity of noise says nothing about int8
quality deltas.  A checkpoint trained to confidence on a learnable corpus is
the honest test substrate for both.

Phases (each cached on disk; re-runs skip completed phases):
  1. Build a synthetic-but-learnable corpus: templated story sentences over
     a small vocabulary, tokenized by the REAL reference tokenizer, packed
     into a token shard (data.pack_documents).
  2. Train stories15M from scratch with the repo's own train.py + data.py
     until next-token loss is well under 1 nat (confident logits), then
     export through checkpoint.param_tree_to_weights -> save_npz.
  3. Measure speculative int8 self-draft acceptance + throughput on the
     trained weights (spec machinery from speculative.py, greedy-lossless).
  4. Measure ppl(fp32) vs ppl(int8) on a held-out corpus slice (eval.py) —
     the first real quantization-quality delta.

Run on the real chip:  python scripts/train_confident.py
"""

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CKPT = "/tmp/stories15M_confident.npz"
SHARD = "/tmp/confident_corpus.bin"
TOKENIZER = "/root/reference/tokenizer.model.np"
STEPS = 800
BATCH, SEQ = 32, 255


def corpus_texts():
    """Deterministic templated stories: enough structure to be learnable to
    low loss, enough slot variety that the model must actually condition on
    context (not memorize one string)."""
    subjects = ["the little cat", "a brave dog", "the old wizard",
                "a tiny robot", "the happy child", "a green dragon",
                "the quiet mouse", "a clever fox"]
    verbs = ["found", "carried", "painted", "followed", "dropped",
             "watched", "shared", "hid"]
    objects = ["a red ball", "the golden key", "a warm blanket",
               "the shiny stone", "a sweet apple", "the paper boat",
               "a silver coin", "the broken clock"]
    places = ["in the garden", "near the river", "under the bridge",
              "on the hill", "inside the barn", "by the sea"]
    texts = []
    for s, v, o, p in itertools.product(subjects, verbs, objects, places):
        texts.append(f"One day {s} {v} {o} {p}. Then {s} smiled and went "
                     f"home to sleep.")
    return texts  # 3072 docs, ~30 tokens each


def build_shard():
    from llama3np_tpu import Tokenizer
    from llama3np_tpu.data import pack_documents

    tok = Tokenizer(TOKENIZER)
    texts = corpus_texts()
    n = pack_documents(texts[: len(texts) * 9 // 10], tok, SHARD)
    print(f"packed {n:,} train tokens -> {SHARD}", flush=True)
    return tok, texts[len(texts) * 9 // 10:]  # held-out tail


def train():
    import jax
    from llama3np_tpu import preset, synthetic_weights
    from llama3np_tpu.checkpoint import (build_param_tree,
                                         param_tree_to_weights, save_npz)
    from llama3np_tpu.data import TokenDataset, prefetch_to_device
    from llama3np_tpu.models.llama import StaticConfig
    from llama3np_tpu.ops.core import rope_tables
    from llama3np_tpu.train import init_optimizer, make_train_step

    args = preset("stories15M", dtype="float32")
    cfg = StaticConfig.from_args(args)
    params = build_param_tree(synthetic_weights(args, seed=0), args)
    params = jax.device_put(params)
    cos, sin = rope_tables(args.head_dim, args.max_seq_len, args.rope_theta)
    opt, opt_state = init_optimizer(params, learning_rate=6e-4)
    step = make_train_step(opt, cfg)
    ds = TokenDataset(SHARD)
    t0 = time.perf_counter()
    it = prefetch_to_device(ds.batches(BATCH, SEQ, seed=0, epochs=None))
    loss = None
    for i, batch in enumerate(it):
        params, opt_state, loss = step(params, opt_state, batch, cos, sin)
        if i % 100 == 0 or i == STEPS - 1:
            print(f"step {i:4d}: loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if i + 1 >= STEPS:
            break
    final = float(loss)
    save_npz(param_tree_to_weights(jax.tree.map(np.asarray, params), args),
             CKPT)
    print(f"trained to loss {final:.4f}; saved {CKPT}", flush=True)
    return final


def measure_speculative():
    from llama3np_tpu import Tokenizer, preset
    from llama3np_tpu.models.llama import Llama
    from llama3np_tpu.speculative import SpeculativeGenerator, quantized_draft

    args = preset("stories15M", dtype="float32")
    weights = dict(np.load(CKPT))
    target = Llama(weights, args)
    tok = Tokenizer(TOKENIZER)
    prompt = [tok.encode("One day the little cat", add_bos=True)]
    N = 200

    toks = target.generate_tokens(prompt, N)  # compile
    import jax
    jax.block_until_ready(toks)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(
            target.generate_tokens(prompt, N))
        best = min(best, time.perf_counter() - t0)
    base_tps = N / best
    print(f"\ntarget-only: {base_tps:,.0f} tok/s wall", flush=True)
    print("sample:", tok.decode(np.asarray(toks)[0, :24].tolist()),
          flush=True)

    for k in (4, 8):
        sg = SpeculativeGenerator(target, quantized_draft(weights, args), k=k)
        out = sg.generate_tokens(prompt, N)  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = sg.generate_tokens(prompt, N)
            best = min(best, time.perf_counter() - t0)
        st = sg.last_stats
        same = (np.asarray(out) == np.asarray(toks)).all()
        print(f"spec k={k}: accept {st['accept_rate']:.2f}, "
              f"{N / best:,.0f} tok/s = {N / best / base_tps:.2f}x "
              f"(rounds {st['rounds']}, lossless={bool(same)})", flush=True)


def measure_ppl(held_out):
    from llama3np_tpu import Tokenizer, preset
    from llama3np_tpu.eval import perplexity_of_texts
    from llama3np_tpu.models.llama import Llama

    tok = Tokenizer(TOKENIZER)
    weights = dict(np.load(CKPT))
    out = {}
    for quant in (None, "int8"):
        args = preset("stories15M", dtype="float32", quant=quant,
                      fuse_matmuls=False)
        engine = Llama(weights, args)
        out[quant] = perplexity_of_texts(engine, tok, held_out)
        print(f"ppl({quant or 'fp32'}): {out[quant]['ppl']:.4f} "
              f"({out[quant]['tokens']} held-out tokens)", flush=True)
    d = out["int8"]["nll_per_token"] - out[None]["nll_per_token"]
    print(f"int8 quality delta: +{d:.5f} nats/token "
          f"(ppl {out[None]['ppl']:.4f} -> {out['int8']['ppl']:.4f})",
          flush=True)


def main():
    import jax
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    _, held_out = build_shard()
    if not os.path.exists(CKPT):
        train()
    else:
        print(f"reusing {CKPT}", flush=True)
    measure_speculative()
    measure_ppl(held_out)


if __name__ == "__main__":
    main()
