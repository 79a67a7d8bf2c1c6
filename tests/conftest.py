"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised on a fake mesh via
``xla_force_host_platform_device_count`` (the TPU answer to "test distributed
without a cluster"); the real-TPU path is covered by bench.py and the driver's
compile checks.
"""

import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
