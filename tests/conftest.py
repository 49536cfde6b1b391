"""Test configuration: the suite always runs on CPU with 8 virtual devices.

Correctness tests don't need the real chip, and routing dozens of small
compiles through a remote TPU compile service is prohibitively slow — so the
TPU plugin is disabled here regardless of the ambient environment. Set
MDT_TEST_ON_TPU=1 to opt back into the ambient backend (for kernel
validation runs). Env setup must precede backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache makes repeat suite runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if not os.environ.get("MDT_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU plugin from force-registering
    # the TPU plugin may have registered at interpreter startup (sitecustomize)
    # and forced jax_platforms; override before any backend initializes
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
