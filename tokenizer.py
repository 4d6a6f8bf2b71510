"""Reference-compatible import shim: `from tokenizer import Tokenizer`."""

from llama3np_tpu.tokenizer import Tokenizer

__all__ = ["Tokenizer"]
