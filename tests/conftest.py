"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

This mirrors the driver's multi-chip dry-run environment and is the
framework's fake multi-device backend for data-parallel/collective tests
(SURVEY.md §4): no TPU pod is needed to validate shardings.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
