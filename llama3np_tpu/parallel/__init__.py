from .sharding import (
    make_mesh,
    make_multihost_mesh,
    mesh_from_args,
    param_pspecs,
    cache_pspecs,
    shard_params,
    shard_cache,
    validate_tp,
    load_param_tree_sharded,
)

__all__ = [
    "make_mesh", "make_multihost_mesh", "mesh_from_args", "param_pspecs",
    "cache_pspecs", "shard_params", "shard_cache", "validate_tp",
    "load_param_tree_sharded",
]
