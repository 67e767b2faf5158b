"""Test environment: force CPU with 8 virtual devices.

Multi-device tests run on a faked 8-device host-platform mesh (the
SURVEY.md §4 strategy) so the full DP/TP sharding path compiles and executes
without TPU hardware.  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic flag defaults: tests pin CODE-default behavior and opt into
# fused.py flags explicitly; a TUNED.json committed by the unattended
# battery must not change what the suite exercises.
os.environ["RESNETC_NO_TUNED"] = "1"

import jax  # noqa: E402

# On this image the TPU plugin force-appends itself to jax_platforms
# (overriding JAX_PLATFORMS), and jax 0.9 ignores the old
# xla_force_host_platform_device_count XLA flag — the supported mechanism is
# the jax_num_cpu_devices config, set before any backend initialises.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Synchronous CPU dispatch: with the async executor + donated buffers the
# 8-virtual-device backend showed rare (~1/6) wrong-numerics races in the
# train-step test; tests trade a little speed for determinism.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng() -> np.random.Generator:
    # Function-scoped on purpose: a session-scoped generator makes every
    # test's draws depend on which tests consumed the stream before it, so
    # accuracy-threshold tests (int8 rel-MAE / argmax gates) flake with
    # collection order.  Each test sees the same deterministic stream.
    return np.random.default_rng(1234)
