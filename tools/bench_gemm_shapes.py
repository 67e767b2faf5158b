#!/usr/bin/env python
"""gemm.matmul vs lax.dot_general at the five ResNet-50 GEMM shapes
(salted harness — see PERF.md).  VERDICT r1 item 5's measurement."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.gemm import matmul
from resnetc_tpu.utils.timing import chained_seconds_per_iter

# (M, K, N): the 1x1 convs of each stage as GEMMs at batch 256, + the head.
SHAPES = [
    ("L1 1x1", 256 * 56 * 56, 64, 256),
    ("L2 1x1", 256 * 28 * 28, 128, 512),
    ("L3 1x1", 256 * 14 * 14, 256, 1024),
    ("L4 1x1", 256 * 7 * 7, 512, 2048),
    ("fc head", 256, 2048, 1000),
]


def main() -> int:
    rng = np.random.default_rng(0)
    for name, m, k, n in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
        salt0 = jnp.zeros((1, 1), jnp.float32)

        # Both sides reduce |out| in FULL: XLA narrows a sliced dot to the
        # slice, and reassociates a plain sum(x@w) into O(MK+KN) row/col
        # sums — the abs() makes the reduction non-reassociable.  The one
        # full-output read per iter is paid symmetrically; the ratio is
        # honest, absolutes slightly inflated.
        def pallas_fn(salt):
            xx = x + (salt.sum() * 1e-30).astype(x.dtype)
            out = matmul(xx, w)
            return jnp.sum(jnp.abs(out.astype(jnp.float32))).reshape(1, 1)

        def xla_fn(salt):
            xx = x + (salt.sum() * 1e-30).astype(x.dtype)
            out = jax.lax.dot_general(
                xx, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(jnp.abs(out)).reshape(1, 1)

        sec_p = chained_seconds_per_iter(pallas_fn, salt0, iters=16)
        sec_x = chained_seconds_per_iter(xla_fn, salt0, iters=16)
        tf = lambda s: 2 * m * k * n / s / 1e12
        print(
            f"{name:8s} ({m},{k})x({k},{n}): pallas {sec_p*1e3:7.3f} ms "
            f"({tf(sec_p):6.1f} TF/s)  xla {sec_x*1e3:7.3f} ms "
            f"({tf(sec_x):6.1f} TF/s)  ratio {sec_x/sec_p:4.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
