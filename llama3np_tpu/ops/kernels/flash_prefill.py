"""Flash prefill attention kernel (causal, GQA, batch-agnostic).

Blockwise-causal attention for the start_pos == 0 prefill: grid walks
(batch, q-head, q-block, kv-block); a VMEM scratch carries the flash
running-max / normalizer / accumulator across kv-blocks; fully-masked
kv-blocks above the diagonal are predicated off.  Peak VMEM is
O(q_block * kv_block) per step regardless of sequence length — the kernel
realization of `ops.core.blockwise_causal_attention` (its numerics oracle),
and the long-context answer to the reference's dense [L, L] score tensor
(reference llama3.py:200-206).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def supports(L: int) -> bool:
    """Prompt lengths this kernel's default blocking handles: block shapes
    must tile L exactly and respect TPU sublane granularity (covers every
    power-of-two prefill bucket; odd direct-__call__ lengths fall back to the
    XLA paths)."""
    return L >= 16 and L % 16 == 0 and (L <= 256 or L % 256 == 0)


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
            *, bq: int, bk: int, scale: float, num_kv_blocks: int):
    i = pl.program_id(2)  # q block
    j = pl.program_id(3)  # kv block

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Causal: kv block j is visible iff its first row <= q block's last row.
    @pl.when(j * bk <= i * bq + (bq - 1))
    def _():
        q = q_ref[0].astype(jnp.float32)          # [bq, HD]
        k = k_ref[0].astype(jnp.float32)          # [bk, HD]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                  # [bq, bk]
        q_idx = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kv_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = kv_idx <= q_idx
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]                          # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        # Explicit zeroing: a fully-masked row has s == m_new == NEG_INF and
        # exp(0) would contribute 1 per masked entry.
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(j == num_kv_blocks - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  q_block: int = 256, kv_block: int = 256,
                  interpret: bool = False) -> jax.Array:
    """Causal self-attention over one block at start_pos == 0.

    q: [B, L, NH, HD]; k, v: [B, L, KVH, HD].  L must divide q_block/kv_block
    (callers pad to buckets).  Returns [B, L, NH, HD].
    """
    B, L, NH, HD = q.shape
    KVH = k.shape[2]
    G = NH // KVH
    bq = min(q_block, L)
    bk = min(kv_block, L)
    assert L % bq == 0 and L % bk == 0, (L, bq, bk)
    nqb = L // bq
    nkb = L // bk

    qt = q.transpose(0, 2, 1, 3)  # [B, NH, L, HD]
    kt = k.transpose(0, 2, 1, 3)  # [B, KVH, L, HD]
    vt = v.transpose(0, 2, 1, 3)

    import functools
    kernel = functools.partial(
        _kernel, bq=bq, bk=bk, scale=1.0 / math.sqrt(HD), num_kv_blocks=nkb
    )

    out = pl.pallas_call(
        kernel,
        grid=(B, NH, nqb, nkb),
        in_specs=[
            pl.BlockSpec((1, None, bq, HD),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, None, bk, HD),
                         lambda b, h, i, j: (b, h // (NH // KVH), j, 0)),
            pl.BlockSpec((1, None, bk, HD),
                         lambda b, h, i, j: (b, h // (NH // KVH), j, 0)),
        ],
        out_specs=pl.BlockSpec((1, None, bq, HD),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NH, L, HD), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, HD), jnp.float32),   # acc
            pltpu.VMEM((bq, 1), jnp.float32),    # running max
            pltpu.VMEM((bq, 1), jnp.float32),    # normalizer
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)  # [B, L, NH, HD]
