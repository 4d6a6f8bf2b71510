from . import core
from .core import (
    rms_norm,
    swiglu,
    rope_tables,
    apply_rope,
    causal_attention,
    cache_attention,
    update_kv_cache,
)

__all__ = [
    "core", "rms_norm", "swiglu", "rope_tables", "apply_rope",
    "causal_attention", "cache_attention", "update_kv_cache",
]
