"""Test bootstrap: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY §4: the
multi-device testing technique the reference lacks)."""

import os
import sys

# Must happen before the CPU client is created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize registers itself at interpreter start
# and force-sets jax_platforms="axon,cpu", overriding the env var — undo that
# so the suite runs hermetically on the virtual CPU mesh (the real chip is
# reserved for bench.py, and the tunnel is single-process).
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from llama3np_tpu import preset, synthetic_weights, build_param_tree  # noqa: E402

# Reference data artifact (read-only); present in the build environment.
REFERENCE_TOKENIZER = "/root/reference/tokenizer.model.np"


@pytest.fixture(scope="session")
def tiny_args():
    """GQA config (n_kv_heads < n_heads) — exercises the grouped path."""
    return preset("test-tiny")


@pytest.fixture(scope="session")
def tiny_weights(tiny_args):
    return synthetic_weights(tiny_args, seed=7)


@pytest.fixture(scope="session")
def tiny_params(tiny_args, tiny_weights):
    return build_param_tree(tiny_weights, tiny_args)


@pytest.fixture(scope="session")
def mha_args():
    """MHA config with non-aligned head_dim=16 — the stories15M shape class."""
    return preset("test-tiny-mha")


@pytest.fixture(scope="session")
def mha_weights(mha_args):
    return synthetic_weights(mha_args, seed=11)


@pytest.fixture(scope="session")
def mha_params(mha_args, mha_weights):
    return build_param_tree(mha_weights, mha_args)


@pytest.fixture()
def rng():
    # Function-scoped: a shared mutable generator makes test inputs depend on
    # execution order (bf16 token-identity tests then flake on near-ties).
    return np.random.default_rng(42)
