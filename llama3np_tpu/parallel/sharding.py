"""Device mesh construction and parameter/cache sharding rules.

The reference has no parallelism of any kind (SURVEY §5: no communication
backend, single process).  Scaling here is therefore designed the TPU way:
a `jax.sharding.Mesh` with ("dp", "tp") axes, `NamedSharding` annotations on
the parameter pytree and KV cache, and GSPMD inserting the collectives —
tensor-parallel attention shards heads, the FFN shards columns, and the
all-reduce after o_proj/down_proj emerges implicitly from the partitioned
matmul (psum over "tp" riding ICI).

Layout rules (per stacked weight; leading axis is always layers, unsharded):

    wq/wk/wv  [NL, D, H*HD]  -> shard out-columns (heads) over "tp"
    wo        [NL, H*HD, D]  -> shard in-rows   (heads) over "tp"
    w_gate/up [NL, D, FD]    -> shard out-columns over "tp"
    w_down    [NL, FD, D]    -> shard in-rows over "tp"
    lm_head   [D, VS]        -> shard vocab over "tp"
    embedding [VS, D]        -> shard vocab over "tp"
    norms     [NL, D] / [D]  -> replicated
    cache k   [NL, B, KVH, HD, M] -> B over "dp", KVH over "tp"
    cache v   [NL, B, KVH, M, HD] -> B over "dp", KVH over "tp"

GQA constraint: "tp" must divide kv_heads (each shard owns whole KV heads so
grouped attention stays local; cf. the head-grouping math at reference
llama3.py:126-130,190-191).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelArgs


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp", "tp") mesh over `dp*tp` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def mesh_from_args(args: ModelArgs, devices=None) -> Optional[Mesh]:
    if args.mesh_dp * args.mesh_tp <= 1:
        return None
    return make_mesh(args.mesh_dp, args.mesh_tp, devices)


def param_pspecs(args: ModelArgs) -> Dict:
    """PartitionSpec tree matching checkpoint.build_param_tree's structure."""
    return {
        "tok_embedding": P("tp", None),
        "layers": {
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "w_gate": P(None, None, "tp"),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
            "attn_norm": P(None, None),
            "ffn_norm": P(None, None),
        },
        "norm": P(None),
        "lm_head": P(None, "tp"),
    }


def cache_pspecs() -> Dict:
    return {
        "k": P(None, "dp", "tp", None, None),
        "v": P(None, "dp", "tp", None, None),
    }


def activation_pspec() -> P:
    return P("dp", None, None)


def _named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def validate_tp(args: ModelArgs, mesh: Mesh):
    tp = mesh.shape.get("tp", 1)
    if args.kv_heads % tp:
        raise ValueError(
            f"tensor-parallel degree {tp} must divide kv_heads {args.kv_heads} "
            f"(each shard owns whole KV-head groups)"
        )
    if args.vocab_size % tp:
        raise ValueError(f"tp={tp} must divide vocab_size {args.vocab_size}")


def shard_params(params: Dict, mesh: Mesh, args: ModelArgs) -> Dict:
    """device_put the parameter pytree with the TP layout above.

    For checkpoints larger than host memory, shard per-leaf (each leaf is
    placed before the next loads) — the npz loader is lazy, so peak host
    memory is one stacked weight."""
    validate_tp(args, mesh)
    shardings = _named(mesh, param_pspecs(args))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def shard_cache(cache: Dict, mesh: Mesh) -> Dict:
    shardings = _named(mesh, cache_pspecs())
    return jax.tree.map(lambda x, s: jax.device_put(x, s), cache, shardings)
