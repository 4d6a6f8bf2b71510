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
    cache k/v [NL, B, KVH, M, HD] -> B over "dp", KVH over "tp"

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


def make_multihost_mesh(dp: int = 1, tp: int = 1) -> Mesh:
    """Multi-host mesh: tensor parallelism stays within each host's ICI
    domain and data parallelism spans hosts over DCN (the layout the 70B
    config wants — collectives after o_proj/down_proj ride ICI; only
    gradient/batch traffic crosses DCN).

    Uses `mesh_utils.create_hybrid_device_mesh` when the process set is
    actually multi-host; degenerates to the flat mesh on one host (so the
    same code path is testable on a virtual single-host mesh).
    """
    import jax
    from jax.experimental import mesh_utils

    n_hosts = jax.process_count()
    if n_hosts <= 1:
        return make_mesh(dp, tp)
    per_host = jax.local_device_count()
    if tp > per_host:
        raise ValueError(
            f"tp={tp} exceeds local devices ({per_host}); "
            f"TP must stay inside one host's ICI domain"
        )
    if dp % n_hosts:
        raise ValueError(
            f"dp={dp} must be a multiple of the host count ({n_hosts}): "
            f"data parallelism is what spans hosts over DCN"
        )
    if (dp // n_hosts) * tp != per_host:
        raise ValueError(
            f"per-host mesh ({dp // n_hosts} x {tp}) must cover the "
            f"{per_host} local devices"
        )
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp // n_hosts, tp),
        dcn_mesh_shape=(n_hosts, 1),
    )
    return Mesh(devices, axis_names=("dp", "tp"))


def param_pspecs(args: ModelArgs, quant: bool = False) -> Dict:
    """PartitionSpec tree matching checkpoint.build_param_tree's structure.

    With `quant`, adds specs for the int8 scale leaves
    (checkpoint.quantize_param_tree on the split tree): per-output-channel
    scales shard exactly like their weight's output axis — column-sharded
    weights (wq/wk/wv/gate/up, lm_head) shard their scales over "tp",
    row-sharded weights (wo/w_down) replicate theirs (full output columns
    live on every shard; the psum after the partitioned matmul is unchanged
    because the post-scale distributes over the sum of partial products)."""
    specs = {
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
    if quant:
        specs["layers"].update({
            "wq_scale": P(None, None, "tp"),
            "wk_scale": P(None, None, "tp"),
            "wv_scale": P(None, None, "tp"),
            "wo_scale": P(None, None, None),
            "w_gate_scale": P(None, None, "tp"),
            "w_up_scale": P(None, None, "tp"),
            "w_down_scale": P(None, None, None),
        })
        specs["tok_embedding_scale"] = P("tp", None)
        specs["lm_head_scale"] = P(None, "tp")
    return specs


def cache_pspecs() -> Dict:
    return {
        "k": P(None, "dp", "tp", None, None),
        "v": P(None, "dp", "tp", None, None),
    }


def serving_cache_pspecs(cache: Dict) -> Dict:
    """PartitionSpecs for a BatchEngine cache (dense slots or page pool).

    Both layouts are [NL, B-or-P, KVH, M-or-page, HD] with KVH at axis 2,
    and the int8 scale leaves drop the trailing HD — so one rule covers all
    four: shard KVH over "tp", replicate everything else.  The slot/page
    axis deliberately does NOT shard over "dp": admissions scatter into a
    single slot's rows and the block tables are host-side, so the engine's
    unit of data parallelism is a whole engine replica, not a slot split
    (each dp rank would otherwise pay a cross-device reshard per admission).
    """
    return {
        name: P(None, None, "tp", *(None,) * (arr.ndim - 3))
        for name, arr in cache.items()
    }


def shard_serving_cache(cache: Dict, mesh: Mesh) -> Dict:
    specs = serving_cache_pspecs(cache)
    return {name: jax.device_put(arr, NamedSharding(mesh, specs[name]))
            for name, arr in cache.items()}


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
    quant = "wq_scale" in params["layers"]
    shardings = _named(mesh, param_pspecs(args, quant=quant))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


def shard_cache(cache: Dict, mesh: Mesh) -> Dict:
    shardings = _named(mesh, cache_pspecs())
    return jax.tree.map(lambda x, s: jax.device_put(x, s), cache, shardings)


# ---------------------------------------------------------------------------
# Streaming sharded checkpoint load (70B-class)
# ---------------------------------------------------------------------------

def load_param_tree_sharded(model_path: str, args: ModelArgs, mesh: Mesh,
                            dtype=None) -> Dict:
    """Load a reference-schema .npz directly onto the mesh without ever
    materializing the full parameter tree on the host.

    Each stacked leaf is created with `jax.make_array_from_callback`: the
    callback receives a device's shard index and materializes only that
    slice, so peak host memory is one layer weight plus one shard (for a 70B
    tensor-parallel load, far below the whole checkpoint — the host-OOM
    hazard SURVEY §7 hard-part 4 calls out).  A small decompression cache
    keeps each npz entry from being re-read once per device shard.
    """
    import functools

    validate_tp(args, mesh)
    np_dtype = np.dtype(dtype or args.dtype)
    npz = np.load(model_path)
    specs = param_pspecs(args)

    @functools.lru_cache(maxsize=4)
    def load_entry(key):
        # npz entries are zip-compressed; decompress once per entry, not once
        # per shard callback.
        return npz[key]

    def leaf(shape, spec, read_slice):
        sharding = NamedSharding(mesh, spec)

        def cb(index):
            return np.ascontiguousarray(read_slice(index), dtype=np_dtype)

        return jax.make_array_from_callback(shape, sharding, cb)

    def stacked(fmt, transpose):
        """Reader over the per-layer npz entries for one stacked weight."""
        first = load_entry(fmt.format(i=0))
        base_shape = first.T.shape if transpose else first.shape
        shape = (args.n_layers, *base_shape)

        def read_slice(index):
            layer_idx = index[0]
            layers = range(*layer_idx.indices(args.n_layers))
            parts = []
            for i in layers:
                w = load_entry(fmt.format(i=i))
                w = w.T if transpose else w
                parts.append(np.asarray(w[index[1:]]))
            return np.stack(parts)

        return shape, read_slice

    def plain(key, transpose=False):
        def read_slice(index):
            w = load_entry(key)
            w = w.T if transpose else w
            return np.asarray(w[index])

        shape = load_entry(key).shape
        if transpose:
            shape = shape[::-1]
        return shape, read_slice

    layer_fmts = {
        "wq": ("model.layers.{i}.self_attn.q_proj.weight", True),
        "wk": ("model.layers.{i}.self_attn.k_proj.weight", True),
        "wv": ("model.layers.{i}.self_attn.v_proj.weight", True),
        "wo": ("model.layers.{i}.self_attn.o_proj.weight", True),
        "w_gate": ("model.layers.{i}.mlp.gate_proj.weight", True),
        "w_up": ("model.layers.{i}.mlp.up_proj.weight", True),
        "w_down": ("model.layers.{i}.mlp.down_proj.weight", True),
        "attn_norm": ("model.layers.{i}.input_layernorm.weight", False),
        "ffn_norm": ("model.layers.{i}.post_attention_layernorm.weight", False),
    }
    layers = {}
    for name, (fmt, transpose) in layer_fmts.items():
        shape, rd = stacked(fmt, transpose)
        layers[name] = leaf(shape, specs["layers"][name], rd)

    emb_shape, emb_rd = plain("model.embed_tokens.weight")
    norm_shape, norm_rd = plain("model.norm.weight")
    head_key = ("lm_head.weight" if "lm_head.weight" in npz.files
                else "model.embed_tokens.weight")
    head_shape, head_rd = plain(head_key, transpose=True)
    return {
        "tok_embedding": leaf(emb_shape, specs["tok_embedding"], emb_rd),
        "layers": layers,
        "norm": leaf(norm_shape, specs["norm"], norm_rd),
        "lm_head": leaf(head_shape, specs["lm_head"], head_rd),
    }
