"""llama3np_tpu — a TPU-native JAX inference framework with the capabilities
of llama3.np (the pure-NumPy Llama reference).

Rebuilt TPU-first rather than ported: jitted functional forward passes with
explicit KV-cache state, `lax.scan` token loops, Pallas kernels for the hot
attention paths, and `jax.sharding` meshes for tensor/data parallelism.  The
reference's public surface — `ModelArgs`, `Tokenizer`, `load_parameters`,
`Llama(model_path, args)`, `model.generate(...)`, and the
`python llama3.py "prompt"` CLI — is preserved.
"""

from .config import ModelArgs, PRESETS, preset
from .tokenizer import Tokenizer
from .checkpoint import (
    load_parameters,
    load_param_tree,
    build_param_tree,
    synthetic_weights,
    write_synthetic_checkpoint,
    save_npz,
)
from .kvcache import init_cache, init_paged_cache, PageAllocator
from .models.llama import Llama, StaticConfig, forward, forward_hidden
from .reference_numpy import NumpyLlama

__version__ = "0.1.0"

__all__ = [
    "ModelArgs", "PRESETS", "preset", "Tokenizer",
    "load_parameters", "load_param_tree", "build_param_tree",
    "synthetic_weights", "write_synthetic_checkpoint", "save_npz",
    "init_cache", "init_paged_cache", "PageAllocator",
    "Llama", "StaticConfig", "forward", "forward_hidden",
    "NumpyLlama", "BatchEngine", "SpeculativeGenerator", "quantized_draft",
]


def __getattr__(name):
    # Lazy: serving pulls in the Generator machinery.
    if name == "BatchEngine":
        from .serving import BatchEngine
        return BatchEngine
    if name in ("SpeculativeGenerator", "quantized_draft"):
        from . import speculative
        return getattr(speculative, name)
    raise AttributeError(name)
