#!/usr/bin/env python
"""XLA alternative for the stride-2 downsample block inside the int8 chain:
dequantize (fuses into conv1) -> bf16 convs -> requantize (fuses into the
last conv's epilogue).  Times the whole int8-in/int8-out stage-transition
segment at the three ResNet-50 ds shapes, for comparison with the Pallas
downsample_block_s2_int8 megakernel."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops import lax_ops
from resnetc_tpu.ops.pallas.block import chain_meta
from resnetc_tpu.utils.timing import chained_seconds_per_iter


def ds_block_xla_int8(xr, w1, b1, w2, b2, w3, b3, wd, bd, scales,
                      *, b, h, w_sp):
    """Chain rows int8 -> chain rows int8, all convs XLA bf16."""
    hp, wp = chain_meta(0, h, w_sp)
    cin = xr.shape[-1]
    s_x, s_y = scales[0], scales[3]
    x = (
        xr.reshape(b, hp, wp, cin)[:, 1 : 1 + h, 1 : 1 + w_sp, :]
        .astype(jnp.bfloat16)
        * s_x.astype(jnp.bfloat16)
    )
    z = jnp.maximum(
        lax_ops.conv2d(x, w1.reshape(1, 1, *w1.shape)) + b1, 0
    ).astype(jnp.bfloat16)
    z = jnp.maximum(lax_ops.conv2d(z, w2, stride=2, padding=1) + b2, 0).astype(
        jnp.bfloat16
    )
    y = lax_ops.conv2d(z, w3.reshape(1, 1, *w3.shape)) + b3
    sc = lax_ops.conv2d(x[:, ::2, ::2, :], wd.reshape(1, 1, *wd.shape)) + bd
    y = jnp.maximum(y + sc, 0)
    yq = jnp.clip(jnp.round(y.astype(jnp.float32) / s_y), -127, 127).astype(
        jnp.int8
    )
    oh, ow = h // 2, w_sp // 2
    hp2, wp2 = chain_meta(0, oh, ow)
    ypad = jnp.pad(yq, ((0, 0), (1, 1), (1, wp2 - ow - 1), (0, 0)))
    return ypad.reshape(b * hp2 * wp2, 4 * w3.shape[-1] // 4)


def main() -> int:
    rng = np.random.default_rng(0)
    batch = 256
    for name, h, cin, c in [("L2b0", 56, 256, 128),
                            ("L3b0", 28, 512, 256),
                            ("L4b0", 14, 1024, 512)]:
        c4 = 4 * c
        hp, wp = chain_meta(0, h, h)
        xr = jnp.asarray(rng.integers(-127, 128, (batch * hp * wp, cin)), jnp.int8)
        g = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)
        w1, b1 = g(cin, c), g(c)
        w2, b2 = g(3, 3, c, c), g(c)
        w3, b3 = g(c, c4), g(c4)
        wd, bd = g(cin, c4), g(c4)
        scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)

        fn = jax.jit(lambda x: ds_block_xla_int8(
            x, w1, b1, w2, b2, w3, b3, wd, bd, scales, b=batch, h=h, w_sp=h))
        sec = chained_seconds_per_iter(fn, xr, iters=16)
        print(f"{name}: XLA-bf16 ds segment {sec*1e3:7.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
