"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run hermetically without TPU hardware; sharding tests fake an
8-chip slice via XLA host devices. NOTE: this interpreter pre-imports jax at
startup with JAX_PLATFORMS=axon (the tunneled TPU), so env vars alone are
too late — we must update jax.config before the first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
