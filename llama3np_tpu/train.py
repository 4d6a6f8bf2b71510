"""Training step (TPU-native extension; the reference is inference-only).

Provides a full-sequence forward (no KV cache), next-token cross-entropy, and
an optax-based jitted train step — primarily so the multi-chip sharding path
(dp batch sharding + tp weight sharding) can be validated end-to-end with
gradients and optimizer state flowing through the same GSPMD layouts as
inference.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from .models.llama import StaticConfig
from .ops import core as ops


def forward_train(params: Dict, input_ids, cos, sin, cfg: StaticConfig,
                  remat: bool = False):
    """Full-sequence logits [B, L, VS] (no cache; causal within the block).

    remat=True wraps each layer in jax.checkpoint: the backward pass
    recomputes the layer's activations instead of storing them, cutting
    activation memory from O(NL x B x L x D) to O(B x L x D) for ~1.3x
    forward FLOPs — the standard trade for long-sequence training on a
    fixed-HBM chip."""
    B, L = input_ids.shape
    h = jnp.take(params["tok_embedding"], input_ids, axis=0)
    cos_l, sin_l = cos[:L], sin[:L]

    def step(h, lp):
        x = ops.rms_norm(h, lp["attn_norm"], cfg.norm_eps)
        q = jnp.dot(x, lp["wq"], precision=cfg.precision,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        k = jnp.dot(x, lp["wk"], precision=cfg.precision,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        v = jnp.dot(x, lp["wv"], precision=cfg.precision,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        rope = ops.apply_rope_split if cfg.rope_split else ops.apply_rope
        q = rope(q.reshape(B, L, cfg.n_heads, cfg.head_dim), cos_l, sin_l)
        k = rope(k.reshape(B, L, cfg.kv_heads, cfg.head_dim), cos_l, sin_l)
        v = v.reshape(B, L, cfg.kv_heads, cfg.head_dim)
        attn = ops.causal_attention(q, k, v, precision=cfg.precision)
        h = h + jnp.dot(attn.reshape(B, L, -1), lp["wo"], precision=cfg.precision,
                        preferred_element_type=jnp.float32).astype(h.dtype)
        z = ops.rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
        h = h + ops.swiglu(z, lp["w_gate"], lp["w_up"], lp["w_down"],
                           precision=cfg.precision)
        return h, None

    if remat:
        step = jax.checkpoint(step)
    h, _ = jax.lax.scan(step, h, params["layers"])
    h = ops.rms_norm(h, params["norm"], cfg.norm_eps)
    return jnp.dot(h, params["lm_head"], precision=cfg.precision,
                   preferred_element_type=jnp.float32)


def next_token_loss(params: Dict, batch, cos, sin, cfg: StaticConfig,
                    remat: bool = False):
    """Mean cross-entropy of predicting batch[:, 1:] from batch[:, :-1]."""
    import optax

    logits = forward_train(params, batch[:, :-1], cos, sin, cfg, remat=remat)
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch[:, 1:]
    )
    return losses.mean()


def make_train_step(optimizer, cfg: StaticConfig, remat: bool = False):
    """Jitted (params, opt_state, batch, cos, sin) -> (params, opt_state, loss)."""
    import optax

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, cos, sin):
        loss, grads = jax.value_and_grad(next_token_loss)(
            params, batch, cos, sin, cfg, remat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def init_optimizer(params, learning_rate: float = 1e-3):
    import optax

    opt = optax.adamw(learning_rate)
    return opt, opt.init(params)
