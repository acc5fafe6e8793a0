"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

This mirrors the driver's multi-chip dry-run environment and is the
framework's fake multi-device backend for data-parallel/collective tests
(SURVEY.md §4): no TPU pod is needed to validate shardings.
"""

import os

# The image's sitecustomize registers an experimental TPU-tunnel backend
# ("axon") whenever PALLAS_AXON_POOL_IPS is set and pins JAX_PLATFORMS to
# it — clear both so tests run on the virtual CPU mesh, not the one real
# TPU chip.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize pins jax_platforms at interpreter start, so the
# env var alone is not enough — override the config directly (before any
# backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the virtual 8-device CPU mesh, got "
    f"{jax.default_backend()} x{len(jax.devices())}"
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
