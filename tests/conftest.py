"""Test environment: force CPU with 8 virtual devices.

Multi-device tests run on a faked 8-device host-platform mesh (the
SURVEY.md §4 strategy) so the full DP/TP sharding path compiles and executes
without TPU hardware.  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
