"""Reference-compatible import shim: `from utils import load_parameters`."""

from llama3np_tpu.checkpoint import load_parameters

__all__ = ["load_parameters"]
