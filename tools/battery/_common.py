"""Shared setup/A-B plumbing for the battery legs.

Every e2e leg needs the same block: build a model, calibrate + quantize
the int8 chain, make a bench batch, then time the forward under some
combination of fused.py flags, restoring defaults afterwards.  One copy
here so a flag rename cannot silently desynchronise the legs measuring
the one unattended chip window.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[2])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from resnetc_tpu.models import resnet  # noqa: E402
from resnetc_tpu.ops.pallas import fused  # noqa: E402
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

import os

#: RESNETC_BATTERY_SMOKE=1 shrinks every leg to CPU-interpret-feasible
#: shapes so the unattended glue (greedy passes, TUNED.json write, A/B
#: plumbing) can be EXECUTED off-TPU before the one chip window.  Timing
#: results under smoke are meaningless by construction.
SMOKE = os.environ.get("RESNETC_BATTERY_SMOKE") == "1"
if SMOKE:
    # Smoke is an off-TPU validation mode: force the CPU platform BEFORE
    # the first backend touch (with the tunnel down, any backend query
    # hangs — and the axon plugin stomps JAX_PLATFORMS=cpu from the env).
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the embedding process
BATCH = 8 if SMOKE else 256
SIZE = 64 if SMOKE else 224


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def bench_batch(batch: int = BATCH, size: int = SIZE, dtype=jnp.bfloat16):
    return jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, size, size, 3), dtype=np.float32
        ),
        dtype,
    )


def build_int8_chain(model: str, calib_batch: int = 8, calib_method: str = "absmax"):
    """(cfg, folded, qtree, scales) for the int8_chain serving path."""
    cfg = resnet.get_config(model)
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    calib = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (calib_batch, SIZE, SIZE, 3), dtype=np.float32
        )
    )
    scales = fused.calibrate_chain_scales(
        cfg, folded, calib, method=calib_method
    )
    qtree = fused.quantize_chain(cfg, folded)
    return cfg, folded, qtree, scales


def time_forward(cfg, qtree, scales, x, *, iters: int = 12) -> float:
    """Honest chained seconds/iter of the int8_chain forward.  Median over 3
    two-point pairs: the tune decisions sit at the 1% level, and one pair's
    chain-length diff (~330 ms at b256) carries ~1% of tunnel RTT jitter."""
    interp = _interpret()
    return chained_seconds_per_iter(
        lambda xx: fused.fused_forward_int8_chain(
            cfg, qtree, scales, xx, interpret=interp
        ),
        x, iters=min(iters, 2) if SMOKE else iters,
        repeats=1 if SMOKE else 3,
    )


def ab(label: str, flags: dict, fn, *, batch: int = BATCH):
    """Run fn() with fused.py ``flags`` set, print one result line, restore
    defaults even on failure.  fn returns seconds/iter."""
    defaults = {k: getattr(fused, k) for k in flags}
    try:
        for k, v in flags.items():
            setattr(fused, k, v)
        sec = fn()
        print(
            f"{label}: {sec * 1e3:.2f} ms -> {batch / sec:.0f} img/s",
            flush=True,
        )
        return sec
    except Exception as e:  # a broken leg must not kill the battery
        print(f"{label}: FAIL {type(e).__name__}: {e}", flush=True)
        return None
    finally:
        for k, v in defaults.items():
            setattr(fused, k, v)
