"""Reference-compatible import shim: `from config import ModelArgs`."""

from llama3np_tpu.config import ModelArgs, PRESETS, preset

__all__ = ["ModelArgs", "PRESETS", "preset"]
