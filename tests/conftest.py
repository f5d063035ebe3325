import os
import sys

# Run the test-suite on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware (SURVEY.md §4: the serial-vs-sharded
# equivalence strategy; JAX's host-device-count override).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Reference-grade precision for numerical assertions.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import oceananigans_tpu  # noqa: E402
from oceananigans_tpu.defaults import defaults  # noqa: E402

defaults.FloatType = np.float64


@pytest.fixture
def rng():
    return np.random.default_rng(42)
