"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (real TPU tunnel), so we
must FORCE cpu here — tests never touch the TPU (bench.py does). In this
JAX version virtual CPU devices come from the ``jax_num_cpu_devices``
config (the old --xla_force_host_platform_device_count XLA flag is
ignored).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


def _configure_jax():
    # sitecustomize (axon TPU plugin) imports jax at interpreter start, so
    # env vars are already latched — update the live config instead.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # backend already initialized or option missing


_configure_jax()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
