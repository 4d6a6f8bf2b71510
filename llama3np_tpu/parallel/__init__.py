from .sharding import (
    make_mesh,
    mesh_from_args,
    param_pspecs,
    cache_pspecs,
    shard_params,
    shard_cache,
    validate_tp,
)

__all__ = [
    "make_mesh", "mesh_from_args", "param_pspecs", "cache_pspecs",
    "shard_params", "shard_cache", "validate_tp",
]
