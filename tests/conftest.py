"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices (the driver
separately dry-runs them); real-TPU perf is measured by bench.py only.
Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
