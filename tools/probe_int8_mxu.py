#!/usr/bin/env python
"""Does a Mosaic int8xint8->int32 dot run at the v5e's 2x int8 MXU rate?

Times a Pallas kernel that does nothing but N back-to-back dots on a
VMEM-resident operand, for int8 and bf16, at ResNet-ish shapes.  If int8
lands at ~2x bf16 FLOP/s the int8 megakernels should lean harder on MXU
shape choices; if it lands at 1x, int8's win is HBM traffic only and the
compute-side design targets bf16 peak.
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnetc_tpu.utils.timing import chained_seconds_per_iter

REPEAT = 16  # dots per kernel invocation (amortizes everything but the MXU)


def make_dot_bench(m, k, dtype, acc):
    """Square (m,k)x(k,k) dots, each CHAINED through the previous result's
    low bits so nothing can be CSE'd or elided (the independent-repeats
    version measured 'dots' at 2^30 TF/s — all folded into one)."""

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        for i in range(REPEAT):
            y = jax.lax.dot_general(
                x, w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
            if dtype == jnp.int8:
                x = jnp.bitwise_and(y, jnp.int32(63)).astype(jnp.int8)
            else:
                x = (y * 1e-3).astype(jnp.bfloat16)
        o_ref[:] = x.astype(o_ref.dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((m, k), lambda: (0, 0)),
                pl.BlockSpec((k, k), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, k), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        )(x, w)

    return run


def main() -> int:
    rng = np.random.default_rng(0)
    shapes = [(1024, 192), (1024, 512), (4096, 512), (2048, 1024)]
    for m, k in shapes:
        for dtype, acc in ((jnp.int8, jnp.int32), (jnp.bfloat16, jnp.float32)):
            if dtype == jnp.int8:
                x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
                w = jnp.asarray(rng.integers(-2, 3, (k, k)), jnp.int8)
            else:
                x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
                w = jnp.asarray(rng.standard_normal((k, k)) * 0.05, jnp.bfloat16)
            run = make_dot_bench(m, k, dtype, acc)
            sec = chained_seconds_per_iter(lambda a: run(a, w), x, iters=32)
            tf = 2 * m * k * k * REPEAT / sec / 1e12
            print(f"  ({m},{k})x({k},{k}) {np.dtype(dtype).name:8s}: "
                  f"{tf:7.1f} TF/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
