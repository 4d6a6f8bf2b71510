"""Model and runtime configuration.

`ModelArgs` is field-for-field compatible with the reference dataclass
(/root/reference/config.py:5-19) — same names, same defaults (stories15M) —
and extends it with TPU-native knobs: the FFN hidden size rule, mesh axes for
tensor/data parallelism, and kernel selection.  Code written against the
reference's ``ModelArgs()`` constructor keeps working unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


def ffn_hidden_dim(dim: int, multiple_of: int = 32, ffn_dim_multiplier: Optional[float] = None) -> int:
    """Llama FFN sizing rule: 2/3 * 4 * dim, optionally scaled, rounded up to a
    multiple of `multiple_of`.  stories15M: dim=288 -> 768 (cf. the constant
    noted at reference llama3.py:98)."""
    hidden = int(2 * (4 * dim) / 3)
    if ffn_dim_multiplier is not None:
        hidden = int(ffn_dim_multiplier * hidden)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)


@dataclass
class ModelArgs:
    # --- reference-compatible fields (defaults = stories15M) ---------------
    dim: int = 288  # D
    n_layers: int = 6
    n_heads: int = 6  # QHN; HD = dim // n_heads
    n_kv_heads: Optional[int] = None  # KVHN (None -> n_heads, i.e. MHA)
    vocab_size: int = 32000  # VS
    max_seq_len: int = 256  # M
    max_new_tokens: int = 150
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6
    max_batch_size: int = 1
    dtype: str = "float32"  # parameter/compute dtype: float32 | bfloat16 | float16

    # --- TPU-native extensions --------------------------------------------
    # Llama-3.1 long-context RoPE frequency remap (HF rope_type "llama3"):
    # {"factor", "low_freq_factor", "high_freq_factor",
    #  "original_max_position_embeddings"}.  None = unscaled (llama2/llama3.0).
    rope_scaling: Optional[dict] = None
    hidden_dim: Optional[int] = None  # FFN dim; None -> ffn_hidden_dim(dim)
    multiple_of: int = 32
    ffn_dim_multiplier: Optional[float] = None
    tie_word_embeddings: bool = False
    # KV cache dtype (defaults to `dtype`); fp32 keeps greedy parity.
    kv_dtype: Optional[str] = None
    # Mesh axes sizes for pjit sharding. Product must divide len(jax.devices()).
    mesh_dp: int = 1  # data-parallel axis ("dp")
    mesh_tp: int = 1  # tensor-parallel axis ("tp")
    # Kernel selection: "xla" (pure jnp, always available), "pallas"
    # (fused TPU kernels), or "auto" (pallas on TPU when shapes allow).
    attn_impl: str = "auto"
    # Single-chip decode optimizations: fuse Q|K|V and gate|up matmuls
    # (ignored under tensor parallelism), and layer-scan unroll factor
    # (None -> full unroll for shallow models, 1 for deep).
    fuse_matmuls: bool = True
    layer_unroll: Optional[int] = None
    # Permute wq/wk columns at load so RoPE runs in split-halves layout
    # (exact transformation; avoids stride-2 lane shuffles on TPU).
    rope_split_layout: bool = True
    # Blockwise (flash-semantics) prefill attention block size; prefills of
    # >= 2 blocks accumulate over KV blocks instead of materializing the
    # dense score tensor.  0 disables.
    prefill_kv_block: int = 512
    # Token-scan unroll in the decode loop (amortizes while-loop overhead;
    # measured ~+10% on stories110M at 4, at extra compile time).
    decode_token_unroll: int = 1
    # Fused-decode-kernel layout: None = auto VMEM plan
    # (ops.kernels.decode_step.plan_layout); pallas_ffn_block forces that FFN
    # column block size (0 = whole layer resident) and pallas_attn_group
    # additionally streams attention per KV-head group (requires a nonzero
    # ffn block).
    pallas_ffn_block: Optional[int] = None
    pallas_attn_group: bool = False
    # Forces the fully streamed 8B-class layout as (dq_block, m_block,
    # do_block, ffn_block); None = auto (plan_streamed when the grouped
    # layouts exceed VMEM).
    pallas_stream: Optional[tuple] = None
    # Weight-only quantization: None (args.dtype weights), "int8", or
    # "int4" (per-output-channel symmetric matmul weights + f32 scales;
    # activations stay args.dtype).  int8 supports every deployment shape:
    # single-chip fused/streamed Pallas, unfused split layout, tensor
    # parallelism (scales shard with their weights), pipeline parallelism,
    # and quantized checkpoints (save_quantized_npz / Llama.from_quantized).
    # int4 (qmax 7; XLA:TPU packs s4 two-per-byte, halving weight streaming
    # again — llama3-8b in ~4.2 GB) runs the unfused split layout shapes.
    quant: Optional[str] = None
    # KV-cache quantization for the SERVING engine (BatchEngine): None
    # (kv_dtype pools) or "int8" — per-(token, kv-head) symmetric scales in a
    # parallel pool; halves cache HBM vs bf16, the capacity prerequisite for
    # the full-8B 8K-context serving config (BASELINE configs[3]).  The
    # single-stream dense generate path ignores it.
    kv_quant: Optional[str] = None
    # Prompt-length padding buckets for the jitted prefill (static shapes).
    prefill_buckets: tuple = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

    def __post_init__(self):
        if self.hidden_dim is None:
            self.hidden_dim = ffn_hidden_dim(self.dim, self.multiple_of, self.ffn_dim_multiplier)
        if self.kv_dtype is None:
            self.kv_dtype = self.dtype

    # Derived quantities --------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_heads if self.n_kv_heads is None else self.n_kv_heads

    @property
    def n_rep(self) -> int:
        return self.n_heads // self.kv_heads

    def validate(self) -> "ModelArgs":
        assert self.dim % self.n_heads == 0, \
            f"n_heads ({self.n_heads}) must divide dim ({self.dim})"
        assert self.n_heads % self.kv_heads == 0, \
            f"kv_heads ({self.kv_heads}) must divide n_heads ({self.n_heads}) (GQA)"
        return self

    def replace(self, **kw) -> "ModelArgs":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets: the BASELINE.json config ladder (stories15M ... llama3-70B).
# ---------------------------------------------------------------------------

PRESETS = {
    "stories15M": dict(
        dim=288, n_layers=6, n_heads=6, n_kv_heads=None, vocab_size=32000,
        max_seq_len=256, rope_theta=10000.0,
    ),
    "stories110M": dict(
        dim=768, n_layers=12, n_heads=12, n_kv_heads=None, vocab_size=32000,
        max_seq_len=1024, rope_theta=10000.0,
    ),
    "tinyllama-1.1b": dict(
        dim=2048, n_layers=22, n_heads=32, n_kv_heads=4, vocab_size=32000,
        max_seq_len=2048, hidden_dim=5632, rope_theta=10000.0, norm_eps=1e-5,
    ),
    # llama3.2 checkpoints ship with the llama3.1 rope remap (HF config
    # rope_scaling factor 32) — it changes frequencies at ALL positions, not
    # just past the original context, so it is required for weight parity.
    "llama3.2-1b": dict(
        dim=2048, n_layers=16, n_heads=32, n_kv_heads=8, vocab_size=128256,
        max_seq_len=8192, hidden_dim=8192, rope_theta=500000.0, norm_eps=1e-5,
        dtype="bfloat16", tie_word_embeddings=True,
        rope_scaling=dict(factor=32.0, low_freq_factor=1.0,
                          high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
    ),
    "llama3.2-3b": dict(
        dim=3072, n_layers=28, n_heads=24, n_kv_heads=8, vocab_size=128256,
        max_seq_len=8192, hidden_dim=8192, rope_theta=500000.0, norm_eps=1e-5,
        dtype="bfloat16", tie_word_embeddings=True,
        rope_scaling=dict(factor=32.0, low_freq_factor=1.0,
                          high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
    ),
    "llama3-8b": dict(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, vocab_size=128256,
        max_seq_len=8192, hidden_dim=14336, rope_theta=500000.0, norm_eps=1e-5,
        dtype="bfloat16",
    ),
    # llama3.1-8b: same widths as llama3-8b plus the long-context remap; the
    # released model supports 131072 positions — the preset defaults to 16K
    # (override max_seq_len for longer; cache memory scales with it).
    "llama3.1-8b": dict(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, vocab_size=128256,
        max_seq_len=16384, hidden_dim=14336, rope_theta=500000.0,
        norm_eps=1e-5, dtype="bfloat16",
        rope_scaling=dict(factor=8.0, low_freq_factor=1.0,
                          high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
    ),
    "llama3-70b": dict(
        dim=8192, n_layers=80, n_heads=64, n_kv_heads=8, vocab_size=128256,
        max_seq_len=8192, hidden_dim=28672, rope_theta=500000.0, norm_eps=1e-5,
        dtype="bfloat16", mesh_tp=8,
    ),
    # Tiny configs for tests / CI (synthetic checkpoints; no downloads).
    "test-tiny": dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=512,
        max_seq_len=64, max_new_tokens=16, hidden_dim=128,
    ),
    "test-tiny-mha": dict(
        dim=48, n_layers=2, n_heads=3, n_kv_heads=None, vocab_size=256,
        max_seq_len=32, max_new_tokens=8, hidden_dim=96,
    ),
}


def preset(name: str, **overrides) -> ModelArgs:
    """Build a `ModelArgs` from a named preset, with overrides."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return ModelArgs(**kw).validate()
