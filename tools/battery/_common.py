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

BATCH = 256


def bench_batch(batch: int = BATCH, size: int = 224, dtype=jnp.bfloat16):
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
            (calib_batch, 224, 224, 3), dtype=np.float32
        )
    )
    scales = fused.calibrate_chain_scales(
        cfg, folded, calib, method=calib_method
    )
    qtree = fused.quantize_chain(cfg, folded)
    return cfg, folded, qtree, scales


def time_forward(cfg, qtree, scales, x, *, iters: int = 12) -> float:
    """Honest chained seconds/iter of the int8_chain forward."""
    return chained_seconds_per_iter(
        lambda xx: fused.fused_forward_int8_chain(cfg, qtree, scales, xx),
        x, iters=iters,
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
