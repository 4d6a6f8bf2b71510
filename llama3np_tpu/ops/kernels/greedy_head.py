"""Fused lm_head + argmax Pallas kernel (a greedy sampling head).

The decode hot loop ends with `argmax(h @ lm_head)` (reference
llama3.py:307,320).  This kernel streams the weight through VMEM in
vocab-column blocks (double-buffered by Mosaic against the previous block's
compute) and folds the argmax into the stream — a running (max, argmax)
scalar pair in scratch, no materialized logits tensor.

Tie-breaking matches `np.argmax` (first/lowest index): within a block the
index is `min(col where s == max)`, across blocks a later block only wins on
a strictly greater max.

**Measured outcome (VERDICT r1 item #8; see BENCHMARKS.md round-2 notes):
this kernel is NOT wired into the decode hot path.**  On hardware, XLA's
in-scan lm_head is faster: XLA hoists a loop-invariant bf16 convert of the
fp32 weight out of the decode scan (--xla_allow_excess_precision) and the
matvec then reads half the bytes at full bandwidth (~8 us/token at
stories15M); this kernel measured ~50 us/token fp32 (an M=1 matvec cannot
feed the MXU, and a VPU broadcast-multiply-reduce formulation measured the
same).  Kept as a building block: it is the exact-fp32 variant (no silent
bf16 downcast) for callers that need reference-exact logit comparisons
without materializing [1, VS].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan_block(d: int, vs: int, wsize: int,
               budget: int = 8 * 1024 * 1024) -> int:
    """Column-block size: largest 128-multiple whose double-buffered weight
    block fits `budget`, clamped to [128, vs rounded up to 128]."""
    blk = (budget // (2 * d * wsize)) // 128 * 128
    vs_pad = -(-vs // 128) * 128
    return max(128, min(blk, vs_pad))


def _make_kernel(nb: int, vs: int, blk: int):
    def kernel(x_ref, w_ref, out_ref, m_s, i_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            m_s[0, 0] = -jnp.inf
            i_s[0, 0] = 0

        x = x_ref[:]                                   # [1, D]
        w = w_ref[:]                                   # [D, blk]
        s = jnp.dot(x.astype(w.dtype), w,
                    preferred_element_type=jnp.float32)  # [1, blk]
        col = j * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        s = jnp.where(col < vs, s, -jnp.inf)
        smax = jnp.max(s)
        bidx = jnp.min(jnp.where(s == smax, col, jnp.int32(2**31 - 1)))
        better = smax > m_s[0, 0]
        m_s[0, 0] = jnp.where(better, smax, m_s[0, 0])
        i_s[0, 0] = jnp.where(better, bidx, i_s[0, 0])

        @pl.when(j == nb - 1)
        def _():
            out_ref[0, 0] = i_s[0, 0]

    return kernel


def argmax_head(x: jax.Array, w: jax.Array, block: int | None = None,
                interpret: bool = False) -> jax.Array:
    """Greedy token for one row: argmax(x @ w, axis=-1) -> [1] int32.

    x: [1, D] (the final-norm hidden state); w: [D, VS] lm_head.  Numerics
    match the XLA path (`jnp.dot(x, w, preferred_element_type=f32)` then
    argmax) — same f32-accumulated matvec, np.argmax tie order.
    """
    d, vs = w.shape
    if block is None:
        block = plan_block(d, vs, jnp.dtype(w.dtype).itemsize)
    nb = -(-vs // block)

    out = pl.pallas_call(
        _make_kernel(nb, vs, block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, d), lambda j: (0, 0)),
            pl.BlockSpec((d, block), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),   # running max
            pltpu.SMEM((1, 1), jnp.int32),     # running argmax
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w)
    return out[0]
