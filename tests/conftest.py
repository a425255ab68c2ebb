"""Test configuration: run all tests on a simulated 8-device CPU backend.

Multi-chip sharding is validated on virtual CPU devices (the standard JAX
fake-backend trick) since only one real TPU chip is available; the driver
separately compile-checks the TPU path via ``__graft_entry__.py``.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# This image's jaxlib force-registers the 'axon' TPU-tunnel platform even
# when JAX_PLATFORMS=cpu is set; initializing it contends on the single
# tunnel client and stalls for minutes. Hard-force CPU-only here.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache makes repeat test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
