"""Perplexity / sequence-scoring evaluation harness.

New capability beyond the reference (which only generates,
reference llama3.py:324-349): teacher-forced scoring of token sequences
through the SAME engine forward the serving paths use — so it evaluates
any deployment configuration directly (fp32/bf16, fused or split weights,
int8 weight-only quantization).  Its primary production use is measuring
quantization quality: ppl(int8) - ppl(fp32) on held-out text is the
accuracy envelope that tolerance tests cannot express.

TPU-first notes:
  * One jitted full-sequence forward per LENGTH BUCKET (powers of two):
    ragged documents pad to the bucket and mask, so a whole corpus compiles
    a handful of programs, not one per document.
  * Scoring batches rows; the [B, L, VS] logits never materialize — the
    per-token log-probabilities are gathered inside the jitted program and
    only [B, L] floats come back to the host (at 128K vocab a [8, 1024, VS]
    f32 logits tensor would be 4 GB).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kvcache import init_cache
from .models.llama import forward_hidden, lm_logits
from .ops import core as ops


class Scorer:
    """Bucketed teacher-forced scorer over a `Llama` engine."""

    def __init__(self, engine, batch_size: int = 8,
                 max_len: Optional[int] = None):
        self.engine = engine
        self.args = engine.args
        self.batch_size = batch_size
        self.max_len = max_len or self.args.max_seq_len
        self._fns = {}  # padded length -> jitted _score_chunk

    def _fn(self, L: int):
        if L not in self._fns:
            self._fns[L] = jax.jit(
                partial(self._score_impl, cfg=self.engine.cfg))
        return self._fns[L]

    def _score_impl(self, params, ids, cos, sin, cfg):
        """Per-position next-token log-probs for one padded batch.

        ids: [B, L] int32.  Returns lp [B, L-1] f32 where lp[b, t] is
        log P(ids[b, t+1] | ids[b, :t+1]).  The vocab axis reduces INSIDE
        the jitted program (log_softmax + gather), so only [B, L-1] floats
        return to the host.  Padded tail positions score garbage that the
        caller discards — causal attention keeps them from touching real
        positions (the same padded-prefill property the engine relies on)."""
        B, L = ids.shape
        row = init_cache(self.args, batch_size=B, max_seq_len=L)
        h, _ = forward_hidden(params, ids, jnp.int32(0), row, cos, sin, cfg,
                              first_chunk=True)
        h = ops.rms_norm(h, params["norm"], cfg.norm_eps)
        logits = lm_logits(params, h[:, :-1, :], cfg.precision)
        lps = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(
            lps, ids[:, 1:, None].astype(jnp.int32), axis=-1)[..., 0]

    def _bucket(self, n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return min(b, self.max_len)  # rope tables only cover max_seq_len

    def score(self, seqs: List[List[int]]):
        """Per-sequence total log-probability and token counts.

        Returns (nll_sum, n_scored) arrays aligned with `seqs`; sequence b
        contributes len(seqs[b]) - 1 scored tokens (the first token is
        conditioned on, never scored).  Sequences longer than max_len are
        truncated (document-level sliding-window scoring composes on top)."""
        nll = np.zeros(len(seqs))
        cnt = np.zeros(len(seqs), np.int64)
        order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
        eng = self.engine
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            rows = [seqs[i][: self.max_len] for i in idxs]
            L = self._bucket(max(len(r) for r in rows))
            ids = np.zeros((len(rows), L), np.int32)
            for j, r in enumerate(rows):
                ids[j, : len(r)] = r
            # Batch-size buckets too: the tail batch pads with row copies.
            if len(rows) < self.batch_size:
                ids = np.vstack([ids] + [ids[-1:]] *
                                (self.batch_size - len(rows)))
            lp = np.asarray(self._fn(L)(
                eng.params, jnp.asarray(ids), eng.cos, eng.sin))
            for j, (i, r) in enumerate(zip(idxs, rows)):
                n = len(r) - 1
                nll[i] = -lp[j, :n].sum()
                cnt[i] = n
        return nll, cnt

    def perplexity(self, seqs: List[List[int]]) -> Dict:
        """Corpus perplexity: exp(total NLL / total scored tokens)."""
        nll, cnt = self.score(seqs)
        total, n = float(nll.sum()), int(cnt.sum())
        if n == 0:
            raise ValueError("no scorable tokens (all sequences length < 2)")
        return {"nll_per_token": total / n, "ppl": float(np.exp(total / n)),
                "tokens": n, "sequences": len(seqs)}


def perplexity_of_texts(engine, tokenizer, texts: Iterable[str],
                        batch_size: int = 8) -> Dict:
    """Tokenize and score raw strings (BOS-prefixed, reference encoding)."""
    seqs = [tokenizer.encode(t, add_bos=True) for t in texts]
    return Scorer(engine, batch_size=batch_size).perplexity(seqs)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="llama3np_tpu.eval",
        description="perplexity over a text file (one document per line)")
    p.add_argument("path", help="text file; blank lines skipped")
    p.add_argument("--preset", default="stories15M")
    p.add_argument("--model", default="./stories15M.model.npz")
    p.add_argument("--tokenizer", default="./tokenizer.model.np")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--quant", default=None, choices=[None, "int8", "int4"])
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)

    from . import Tokenizer, preset, synthetic_weights
    from .models.llama import Llama

    margs = preset(args.preset,
                   **({"quant": args.quant} if args.quant else {}))
    source = (synthetic_weights(margs, seed=0) if args.synthetic
              else args.model)
    engine = Llama(source, margs)
    tok = Tokenizer(args.tokenizer)
    with open(args.path) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    out = perplexity_of_texts(engine, tok, texts,
                              batch_size=args.batch_size)
    import json
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
