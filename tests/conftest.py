"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip hardware is unavailable in CI; sharding tests run on
xla_force_host_platform_device_count=8 CPU devices (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU-tunnel plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
