#!/usr/bin/env python
"""Isolated per-block bench of the int8 chained kernels at every ResNet-50
shape (honest harness): the three L1 variants (projection block 0 with
cin=64, identity chains with cin=256) and the L2/L3/L4 chain blocks.

Usage: JAX_COMPILATION_CACHE_DIR=... python tools/bench_chain_blocks.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.block import (
    bottleneck_block_chained_int8,
    chain_meta,
    quantize_chain_block,
)
from resnetc_tpu.ops.pallas.quant import quantize_per_channel
from resnetc_tpu.utils.timing import chained_seconds_per_iter

CASES = [
    # name, h, cin, c, has_proj
    ("L1b0 proj", 56, 64, 64, True),
    ("L1b1     ", 56, 256, 64, False),
    ("L2b1     ", 28, 512, 128, False),
    ("L3b1     ", 14, 1024, 256, False),
    ("L4b1     ", 7, 2048, 512, False),
]


def main() -> int:
    rng = np.random.default_rng(0)
    batch = 256
    for name, h, cin, c, has_proj in CASES:
        c4 = 4 * c
        g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
        blk = {
            "conv1": {"weight": g(cin, c), "bias": g(c)},
            "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
            "conv3": {"weight": g(c, c4), "bias": g(c4)},
        }
        q = quantize_chain_block(blk)
        kw = {}
        if has_proj:
            wdq, swd = quantize_per_channel(g(cin, c4))
            kw = dict(wdq=wdq, swd=swd, bd=g(c4))
        scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
        hp, wp = chain_meta(0, h, h)
        xr = jnp.asarray(
            rng.integers(-127, 128, (batch * hp * wp, cin)), jnp.int8
        )

        def fn(salt):
            # Salt-carry harness: x is closed over (read from HBM by the
            # kernel itself each iteration — its own DMA, which we WANT to
            # measure); the loop-carried state is a tiny salt folded into
            # the scales so the call can't be hoisted, and the return is a
            # tiny slice (pallas_call is opaque to XLA, so the kernel still
            # runs in full).  The old x-as-carry version paid ~3x the
            # block's own IO in harness feedback (carry rewrite + full
            # output reduce) and overstated every kernel.
            s = scales + jnp.sum(salt) * 1e-30
            out = bottleneck_block_chained_int8(
                xr,
                q["w1q"], q["sw1"], q["b1"],
                q["w2pq"], q["sw2p"], q["b2"],
                q["w3q"], q["sw3"], q["b3"],
                s, h=h, w_sp=h, emit_i8=True, **kw,
            )
            return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

        sec = chained_seconds_per_iter(fn, jnp.zeros((8, 8), jnp.float32), iters=16)
        gflop = (
            2 * batch * hp * wp
            * (cin * c + 9 * c * c + c * c4 + (cin * c4 if has_proj else 0))
            / 1e9
        )
        mb = batch * hp * wp * (cin + c4) / 2**20
        print(
            f"{name}: {sec*1e3:7.3f} ms  {gflop/sec/1e3:6.1f} TF/s  "
            f"{mb/1024/sec:6.2f} GB/s-equiv io", flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
