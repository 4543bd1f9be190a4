"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated the way the reference validates
multi-host paths without a cluster (SURVEY.md §4): here by simulating an
8-device mesh on CPU via ``xla_force_host_platform_device_count``.

Note: the session environment pre-imports jax at interpreter boot with the
``axon`` TPU platform pinned in ``jax.config.jax_platforms``; mutating
``JAX_PLATFORMS`` is therefore a no-op, and initializing the axon backend
from tests would claim the (single, shared) TPU tunnel — minutes of
latency.  We must update the live jax config before any backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent XLA cache under tests: CPU AOT entries can trip host
# feature-mismatch loads; CPU compiles are cheap anyway (the cache exists
# for the 20-40s remote-TPU pallas compiles)
os.environ["FCS_JAX_CACHE_DIR"] = ""

import jax  # noqa: E402  (already imported at boot by sitecustomize)

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge.backends_are_initialized(), \
    "jax backends initialized before conftest could force CPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
