from .llama import Llama, StaticConfig, forward, forward_hidden

__all__ = ["Llama", "StaticConfig", "forward", "forward_hidden"]
