"""Test harness: force a virtual 8-device CPU mesh before JAX import.

Mirrors the multi-host emulation strategy from SURVEY.md §4 — sharding tests
run on xla_force_host_platform_device_count=8 CPU devices; kernels are
validated against the pure-jnp golden renderer (Pallas interpret mode where
needed).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon from the environment; the
# config update below wins over it regardless of import order.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
