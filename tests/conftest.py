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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
