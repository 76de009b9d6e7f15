"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths are validated on a virtual CPU mesh; the real TPU
chip is exercised by bench.py, not the unit tests.
"""

import os
import sys

# The image force-registers the remote-TPU ("axon") PJRT plugin in every
# process via sitecustomize when PALLAS_AXON_POOL_IPS is set; unit tests must
# run on a genuine local CPU mesh, so disable it before JAX loads.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # float64 parity against the oracles

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
