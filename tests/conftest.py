"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated the way the reference validates
multi-host paths without a cluster (SURVEY.md §4): here by simulating an
8-device mesh on CPU via ``xla_force_host_platform_device_count``.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
