"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) so the suite needs no TPU hardware.
Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
