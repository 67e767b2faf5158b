#!/usr/bin/env python
"""Isolate where the stride-2 downsample megakernel's time goes at the
ResNet-50 L2b0 / L3b0 / L4b0 shapes: the XLA phase-plane gather vs the
pallas kernel, across bt choices.  Honest harness (chained fori_loop)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.block import (
    downsample_block_s2_int8,
    quantize_ds_block,
    _pick_bt_ds_s2,
    chain_meta,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter


def make_blk(rng, cin, c):
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    return {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
        "downsample": {"weight": g(cin, c4), "bias": g(c4)},
    }


def gather_only(xr, h, w_sp, b):
    """The XLA side of downsample_block_s2_int8: reshape + one transpose."""
    hp, wp = chain_meta(0, h, w_sp)
    hq, wq = hp // 2, wp // 2
    cin = xr.shape[-1]
    return (
        xr.reshape(b, hq, 2, wq, 2, cin)
        .transpose(2, 4, 0, 1, 3, 5)
        .reshape(4, b * hq * wq, cin)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    for name, h, cin, c in [
        ("L2b0", 56, 256, 128),
        ("L3b0", 28, 512, 256),
        ("L4b0", 14, 1024, 512),
    ]:
        c4 = 4 * c
        blk = make_blk(rng, cin, c)
        q = quantize_ds_block(blk)
        scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
        hp, wp = chain_meta(0, h, h)
        xr = jnp.asarray(
            rng.integers(-127, 128, (args.batch * hp * wp, cin)), jnp.int8
        )
        hq, wq = hp // 2, wp // 2
        bt_def = _pick_bt_ds_s2(args.batch, hq, wq, cin, c, c4)
        gflop = (
            2 * args.batch * hq * wq
            * (cin * c + 9 * c * c + c * c4 + cin * c4) / 1e9
        )

        # Salt-carry harness: xr closed over (the kernel's own HBM reads are
        # the thing measured); tiny salt perturbs the scales so the call
        # can't be hoisted; tiny sliced return keeps harness feedback off
        # the books (pallas_call is opaque — the kernel still runs whole).
        def full(salt):
            s = scales + jnp.sum(salt) * 1e-30
            out = downsample_block_s2_int8(
                xr,
                q["w1q"], q["sw1"], q["b1"],
                q["w2q"], q["sw2"], q["b2"],
                q["w3q"], q["sw3"], q["b3"],
                q["wdq"], q["swd"], q["bd"],
                s, h=h, w_sp=h, emit_i8=True,
            )
            return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

        salt0 = jnp.zeros((8, 8), jnp.float32)
        sec_g = float("nan")  # no XLA-side gather remains to time
        sec_f = chained_seconds_per_iter(full, salt0, iters=args.iters)
        print(
            f"{name}: full {sec_f*1e3:7.3f} ms  gather {sec_g*1e3:7.3f} ms  "
            f"bt={bt_def}  {gflop/sec_f/1e3:6.1f} TF/s eff", flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
