"""Training paths (llama3np_tpu.train): base train step, and gradient
rematerialization (jax.checkpoint) producing bit-equivalent losses and
gradients to the stored-activation path."""

import jax
import numpy as np
import pytest

from llama3np_tpu import preset, synthetic_weights
from llama3np_tpu.checkpoint import build_param_tree
from llama3np_tpu.models.llama import StaticConfig
from llama3np_tpu.ops.core import rope_tables
from llama3np_tpu.train import (init_optimizer, make_train_step,
                                next_token_loss)

ARGS = preset("test-tiny")
CFG = StaticConfig.from_args(ARGS)


@pytest.fixture(scope="module")
def setup():
    params = build_param_tree(synthetic_weights(ARGS, seed=0), ARGS)
    cos, sin = rope_tables(ARGS.head_dim, ARGS.max_seq_len, ARGS.rope_theta)
    rng = np.random.default_rng(11)
    batch = rng.integers(3, ARGS.vocab_size, size=(2, 21)).astype(np.int32)
    return params, cos, sin, jax.numpy.asarray(batch)


def test_remat_matches_stored_activations(setup):
    """jax.checkpoint must change memory behavior only: loss and every
    gradient leaf agree with the non-remat backward."""
    params, cos, sin, batch = setup
    vg = jax.value_and_grad(next_token_loss)
    loss0, g0 = vg(params, batch, cos, sin, CFG, False)
    loss1, g1 = vg(params, batch, cos, sin, CFG, True)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lora_remat_matches(setup):
    from llama3np_tpu.lora import init_lora, lora_loss
    params, cos, sin, batch = setup
    lora = init_lora(ARGS, rank=4, seed=2)
    # Non-zero adapters so the remat path exercises the low-rank branches.
    ly = jax.tree.map(
        lambda x: x + 0.03, lora["layers"])
    vg = jax.value_and_grad(lora_loss)
    loss0, g0 = vg(ly, params, batch, cos, sin, CFG, 2.0, False)
    loss1, g1 = vg(ly, params, batch, cos, sin, CFG, 2.0, True)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_reduces_loss_with_remat(setup):
    params, cos, sin, batch = setup
    # The step donates its params argument; train a copy so the
    # module-scoped fixture's buffers survive for other tests.
    p = jax.tree.map(jax.numpy.copy, params)
    opt, st = init_optimizer(p, learning_rate=1e-3)
    step = make_train_step(opt, CFG, remat=True)
    losses = []
    for _ in range(6):
        p, st, loss = step(p, st, batch, cos, sin)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses
