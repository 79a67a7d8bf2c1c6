"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised on a fake mesh via
``xla_force_host_platform_device_count`` (the TPU answer to "test distributed
without a cluster"); the real-TPU path is covered by bench.py and the driver's
compile checks.
"""

import os

# Must run before jax is imported anywhere. Note: the axon TPU plugin in this
# image ignores JAX_PLATFORMS, so we additionally pin jax_default_device to
# CPU below; mesh tests fetch the 8 virtual devices via backend="cpu".
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

CPU_DEVICES = jax.local_devices(backend="cpu")
jax.config.update("jax_default_device", CPU_DEVICES[0])

# Persistent XLA cache (separate from the TPU one): CPU compiles of the
# UNet/DeepLab/Easter2 test shapes dominate suite wall time; warm runs
# fetch them in milliseconds.
from ocr_inference_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.environ.get("OCR_TEST_COMPILE_CACHE",
                   os.path.expanduser("~/.cache/ocr_tpu_xla_tests"))
)


@pytest.fixture(scope="session")
def cpu_devices():
    return CPU_DEVICES


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
