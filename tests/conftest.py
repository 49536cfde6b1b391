"""Test configuration.

Tests run on whatever JAX backend the environment provides (TPU when
available, else CPU with 8 virtual devices). Multi-chip sharding tests always
run in CPU subprocesses with xla_force_host_platform_device_count=8 so the
suite never needs more than one real chip. Env setup must precede the first
jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache makes repeat suite runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
