"""Test configuration: force an 8-virtual-device CPU backend.

Tests exercise the multi-chip sharding paths on a virtual CPU mesh so the
suite runs identically with or without TPU hardware.

Note: on the axon-tunnelled TPU image, a ``sitecustomize`` registers the
remote-TPU PJRT plugin and force-sets ``jax_platforms="axon,cpu"`` via
``jax.config`` at interpreter start, so the ``JAX_PLATFORMS`` env var alone
is NOT honoured -- the config must be re-overridden after importing jax.
``XLA_FLAGS`` is still read lazily at CPU-backend init, so setting it here
(before any backend is touched) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.key(0)
