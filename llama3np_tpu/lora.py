"""LoRA fine-tuning (low-rank adaptation) over the training forward.

New capability beyond the reference (which is inference-only,
reference llama3.py): parameter-efficient fine-tuning where the frozen
base weights stay untouched and only per-layer low-rank factors
``W + (alpha/r) * A @ B`` train — the standard LoRA decomposition.

TPU-first design decisions:
  * Adapters are STACKED over layers ([NL, in, r] / [NL, r, out]) exactly
    like the base tree's ``params["layers"]``, so one ``lax.scan`` runs the
    adapted forward — same compiled-once layer loop as the base model, no
    per-layer Python unrolling.
  * The adapted matmul is computed as ``x@W + (x@A)@B`` — two skinny
    matmuls (rank r) beside the base one, never a materialized ``W + AB``
    (that would stream a second full weight matrix per step).  XLA fuses
    the rank-r epilogue into the surrounding elementwise work.
  * The train step takes (frozen base, lora) as SEPARATE pytrees; grads and
    optimizer state exist only for the lora tree (adam moments for an 8B
    base would be 64 GB; for rank-16 adapters they are ~50 MB).
  * ``merge_lora`` folds the adapters into a SPLIT-layout param tree for
    zero-overhead inference — merged weights serve through every existing
    engine path (dense/paged/quantized).

Works on the split weight layout (checkpoint.build_param_tree with
fuse_matmuls=False — the training layout, train.py); merge before fusing
or quantizing for deployment.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .config import ModelArgs
from .models.llama import StaticConfig
from .ops import core as ops

# target name -> (in_dim, out_dim) as functions of ModelArgs
_TARGET_DIMS = {
    "wq": lambda a: (a.dim, a.n_heads * a.head_dim),
    "wk": lambda a: (a.dim, a.kv_heads * a.head_dim),
    "wv": lambda a: (a.dim, a.kv_heads * a.head_dim),
    "wo": lambda a: (a.n_heads * a.head_dim, a.dim),
    "w_gate": lambda a: (a.dim, a.hidden_dim),
    "w_up": lambda a: (a.dim, a.hidden_dim),
    "w_down": lambda a: (a.hidden_dim, a.dim),
}

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


def init_lora(args: ModelArgs, rank: int = 8, alpha: float = 16.0,
              targets: Tuple[str, ...] = DEFAULT_TARGETS, seed: int = 0,
              dtype=jnp.float32) -> Dict:
    """Fresh adapter tree: {"layers": {t_a: [NL, in, r], t_b: [NL, r, out]},
    "rank", "alpha", "targets"}.  A ~ N(0, 1/r), B = 0 — the adapted model
    starts EXACTLY equal to the base (A@B = 0), the standard LoRA init."""
    bad = set(targets) - set(_TARGET_DIMS)
    if bad:
        raise ValueError(f"unknown LoRA targets {sorted(bad)}; "
                         f"available: {sorted(_TARGET_DIMS)}")
    key = jax.random.PRNGKey(seed)
    layers = {}
    for t in targets:
        d_in, d_out = _TARGET_DIMS[t](args)
        key, sub = jax.random.split(key)
        layers[f"{t}_a"] = (jax.random.normal(
            sub, (args.n_layers, d_in, rank), dtype) / rank)
        layers[f"{t}_b"] = jnp.zeros((args.n_layers, rank, d_out), dtype)
    return {"layers": layers, "rank": rank, "alpha": float(alpha),
            "targets": tuple(targets)}


def _adapted(x, w, ll: Dict, t: str, scale: float, precision):
    """x @ w plus the low-rank update when target `t` is adapted.
    ll holds ONE layer's adapter slices (from the scan)."""
    y = jnp.dot(x, w, precision=precision,
                preferred_element_type=jnp.float32)
    if f"{t}_a" in ll:
        u = jnp.dot(x, ll[f"{t}_a"], precision=precision,
                    preferred_element_type=jnp.float32)
        y = y + scale * jnp.dot(u.astype(x.dtype), ll[f"{t}_b"],
                                precision=precision,
                                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def forward_train_lora(params: Dict, lora_layers: Dict, batch, cos, sin,
                       cfg: StaticConfig, scale: float,
                       remat: bool = False):
    """train.forward_train with LoRA deltas on the adapted projections.
    lora_layers: the stacked {t_a/t_b: [NL, ...]} dict (lora["layers"]);
    scale: alpha / rank; remat recomputes layer activations in the backward
    pass (see train.forward_train)."""
    B, L = batch.shape
    h = jnp.take(params["tok_embedding"], batch, axis=0)
    cos_l, sin_l = cos[:L], sin[:L]

    def step(h, xs):
        lp, ll = xs
        x = ops.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        q = _adapted(x, lp["wq"], ll, "wq", scale, cfg.precision)
        k = _adapted(x, lp["wk"], ll, "wk", scale, cfg.precision)
        v = _adapted(x, lp["wv"], ll, "wv", scale, cfg.precision)
        rope = ops.apply_rope_split if cfg.rope_split else ops.apply_rope
        q = rope(q.reshape(B, L, cfg.n_heads, cfg.head_dim), cos_l, sin_l)
        k = rope(k.reshape(B, L, cfg.kv_heads, cfg.head_dim), cos_l, sin_l)
        v = v.reshape(B, L, cfg.kv_heads, cfg.head_dim)
        attn = ops.causal_attention(q, k, v, precision=cfg.precision)
        h = h + _adapted(attn.reshape(B, L, -1), lp["wo"], ll, "wo", scale,
                         cfg.precision)
        z = ops.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        gate = _adapted(z, lp["w_gate"], ll, "w_gate", scale, cfg.precision)
        up = _adapted(z, lp["w_up"], ll, "w_up", scale, cfg.precision)
        h = h + _adapted((jax.nn.silu(gate.astype(jnp.float32)).astype(z.dtype)
                          * up), lp["w_down"], ll, "w_down", scale,
                         cfg.precision)
        return h, None

    if remat:
        step = jax.checkpoint(step)
    h, _ = jax.lax.scan(step, h, (params["layers"], lora_layers))
    h = ops.rms_norm(h, params["norm"], cfg.norm_eps)
    return jnp.dot(h, params["lm_head"], precision=cfg.precision,
                   preferred_element_type=jnp.float32)


def lora_loss(lora_layers: Dict, params: Dict, batch, cos, sin,
              cfg: StaticConfig, scale: float, remat: bool = False):
    """Next-token cross-entropy with adapters active (lora_layers FIRST so
    value_and_grad differentiates only the adapters)."""
    import optax

    logits = forward_train_lora(params, lora_layers, batch[:, :-1], cos, sin,
                                cfg, scale, remat=remat)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, batch[:, 1:]).mean()


def make_lora_train_step(optimizer, cfg: StaticConfig, scale: float,
                         remat: bool = False):
    """Jitted (lora_layers, opt_state, params, batch, cos, sin) ->
    (lora_layers, opt_state, loss).  The base `params` is a frozen input —
    no gradients, no optimizer state, donated nothing."""
    import optax

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
    def train_step(lora_layers, opt_state, params, batch, cos, sin):
        loss, grads = jax.value_and_grad(lora_loss)(
            lora_layers, params, batch, cos, sin, cfg, scale, remat)
        updates, opt_state = optimizer.update(grads, opt_state, lora_layers)
        lora_layers = optax.apply_updates(lora_layers, updates)
        return lora_layers, opt_state, loss

    return train_step


def save_lora(lora: Dict, path: str) -> None:
    """Persist an adapter tree as .npz (factors + rank/alpha/targets
    metadata).  Adapters are tiny next to the base (rank-16 over an 8B base
    is ~50 MB), so a plain savez round-trips in milliseconds."""
    import numpy as np

    arrays = {f"layers.{k}": np.asarray(v) for k, v in lora["layers"].items()}
    np.savez(path, __rank__=lora["rank"], __alpha__=lora["alpha"],
             __targets__=np.asarray(lora["targets"]), **arrays)


def load_lora(path: str) -> Dict:
    """Load a save_lora checkpoint back into an adapter tree."""
    import numpy as np

    z = np.load(path)
    layers = {k[len("layers."):]: jnp.asarray(z[k])
              for k in z.files if k.startswith("layers.")}
    return {"layers": layers, "rank": int(z["__rank__"]),
            "alpha": float(z["__alpha__"]),
            "targets": tuple(str(t) for t in z["__targets__"])}


def lora_pspecs(lora: Dict):
    """PartitionSpec tree for lora["layers"] composing with the base TP
    layout (parallel.sharding.param_pspecs):

      * column-sharded weights (wq/wk/wv/w_gate/w_up — output axis over
        "tp"): A replicates (its input axis matches the replicated
        activations), B shards its OUTPUT columns over "tp" — the low-rank
        delta lands pre-sharded exactly like the base matmul's output.
      * row-sharded weights (wo/w_down — input axis over "tp"): A shards its
        INPUT rows over "tp" (matching the tp-sharded activations entering
        the base matmul), so x@A is a partitioned contraction whose psum
        GSPMD merges with the base matmul's existing all-reduce; B
        replicates.
    """
    from jax.sharding import PartitionSpec as P

    col = {"wq", "wk", "wv", "w_gate", "w_up"}
    specs = {}
    for t in lora["targets"]:
        if t in col:
            specs[f"{t}_a"] = P(None, None, None)
            specs[f"{t}_b"] = P(None, None, "tp")
        else:  # wo, w_down: row-sharded base
            specs[f"{t}_a"] = P(None, "tp", None)
            specs[f"{t}_b"] = P(None, None, None)
    return specs


def shard_lora(lora: Dict, mesh) -> Dict:
    """device_put the adapter tree onto the mesh with lora_pspecs."""
    from jax.sharding import NamedSharding

    specs = lora_pspecs(lora)
    layers = {name: jax.device_put(leaf, NamedSharding(mesh, specs[name]))
              for name, leaf in lora["layers"].items()}
    return {**lora, "layers": layers}


def permute_lora_rope_layout(lora: Dict, args: ModelArgs) -> Dict:
    """Permute wq_b/wk_b OUTPUT columns to the split-halves RoPE layout —
    the same load-time transform checkpoint.permute_rope_layout applies to
    the base wq/wk, so adapter deltas add to permuted-weight outputs
    consistently.  A factors are untouched (their axis is the input)."""
    from .ops.core import rope_split_permutation

    ly = dict(lora["layers"])
    if "wq_b" in ly:
        ly["wq_b"] = ly["wq_b"][..., rope_split_permutation(args.n_heads,
                                                            args.head_dim)]
    if "wk_b" in ly:
        ly["wk_b"] = ly["wk_b"][..., rope_split_permutation(args.kv_heads,
                                                            args.head_dim)]
    return {**lora, "layers": ly}


def stack_adapters(adapters, args: ModelArgs, rope_split: bool = False,
                   dtype=None) -> Dict:
    """Build a serving adapter BANK from a list of adapter trees: each
    factor stacks to [NL, NA+1, ...] with bank index 0 all-zero (= base
    model, the default for requests with no adapter).  The layer axis leads
    so the serving layer scan takes one cheap dynamic slice per layer
    before the per-row adapter gather (models/llama.py gather_lora_rows).

    All adapters must share rank / alpha / targets (one compiled program
    serves every adapter; a mixed-rank bank would need shape churn)."""
    if not adapters:
        raise ValueError("stack_adapters needs at least one adapter")
    r0, a0, t0 = (adapters[0]["rank"], adapters[0]["alpha"],
                  tuple(adapters[0]["targets"]))
    for i, ad in enumerate(adapters):
        if (ad["rank"], ad["alpha"], tuple(ad["targets"])) != (r0, a0, t0):
            raise ValueError(
                f"adapter {i} has (rank, alpha, targets)="
                f"{(ad['rank'], ad['alpha'], tuple(ad['targets']))}; the "
                f"bank requires {(r0, a0, t0)} (one compiled program)")
    if rope_split:
        adapters = [permute_lora_rope_layout(ad, args) for ad in adapters]
    dt = jnp.dtype(dtype or args.dtype)
    layers = {}
    for name in adapters[0]["layers"]:
        parts = [jnp.zeros_like(adapters[0]["layers"][name])] + [
            ad["layers"][name] for ad in adapters]
        # [NA+1, NL, ...] -> [NL, NA+1, ...]
        layers[name] = jnp.stack(parts).swapaxes(0, 1).astype(dt)
    return {"layers": layers, "rank": r0, "alpha": a0, "targets": t0,
            "scale": a0 / r0}


def bank_adapter_slice(bank: Dict, index: int) -> Dict:
    """One adapter's [NL, ...] single-adapter tree from a serving bank
    (the admission prefill path's shape; index 0 = the zero adapter)."""
    return {"layers": {name: leaf[:, index]
                       for name, leaf in bank["layers"].items()},
            "scale": bank["scale"]}


def merge_lora(params: Dict, lora: Dict) -> Dict:
    """Fold adapters into a split-layout param tree: W <- W + scale * A@B.
    Returns a NEW tree (the frozen base is untouched) ready for any
    inference path — fuse/quantize/shard afterwards as usual."""
    ly = dict(params["layers"])
    if "wqkv" in ly or "wgu" in ly:
        raise ValueError("merge_lora needs the split weight layout; merge "
                         "before fusing (build_param_tree fuse_matmuls=False)")
    scale = lora["alpha"] / lora["rank"]
    for t in lora["targets"]:
        a = lora["layers"][f"{t}_a"]
        b = lora["layers"][f"{t}_b"]
        delta = jnp.einsum("lir,lro->lio", a, b) * scale
        ly[t] = (ly[t] + delta.astype(ly[t].dtype))
    out = dict(params)
    out["layers"] = ly
    return out
