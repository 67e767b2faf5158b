#!/usr/bin/env python
"""Attribute stride-2 ds-megakernel time to its phases (honest harness).

Phases of ops/pallas/block.py::_ds_block_s2_kernel, cumulative:

  p0 copy  : planes -> out rows (DMA + store floor)
  p1 +g1   : + conv1 on all four planes + fused epilogues into z1w
  p2 +g2   : + the three aligned K=3c conv2 tap dots + dequant
  p3 full  : + conv3 + projection shortcut + requant store (production)

Run with JAX_COMPILATION_CACHE_DIR set to amortize Mosaic compiles.
Usage: python tools/probe_ds_phases.py [--shape L2|L3|L4|all]
"""

from __future__ import annotations

import argparse
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

from resnetc_tpu.ops.pallas.block import (
    _pick_bt_ds_s2,
    chain_meta,
    quantize_ds_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter

SHAPES = {"L2": (56, 256, 128), "L3": (28, 512, 256), "L4": (14, 1024, 512)}


def _probe_kernel(
    pl_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    wd_ref, bd_ref, mask_ref,
    sw1_ref, sw2_ref, sw3_ref, swd_ref,
    o_ref, z1w_ref,
    *, bt, hq, wq, hp2, wp2, c, c4, phase,
):
    rows = bt * hq * wq
    if phase == 0:
        # DMA floor: touch one plane, write the out rows.
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[0 : rows // 4, 0:c] = pl_ref[0, 0 : rows // 4, 0:c]
        return

    for ph in range(2):
        for pw in range(2):
            p = ph * 2 + pw
            zp = jax.lax.dot_general(
                pl_ref[p], w1_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            zp = jnp.maximum(
                zp.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
                + b1_ref[:].astype(jnp.float32),
                0.0,
            )
            zp = zp * mask_ref[p]
            zq = jnp.clip(jnp.round(zp), -127.0, 127.0).astype(jnp.int8)
            if pw == 0:
                z1w_ref[ph, :, 0:c] = zq
                z1w_ref[ph, 0 : rows - 1, 2 * c : 3 * c] = (
                    jax.lax.slice_in_dim(zq, 1, rows, axis=0)
                )
            else:
                z1w_ref[ph, :, c : 2 * c] = zq
    if phase == 1:
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[0:rows, 0:c] = z1w_ref[0, :, 0:c]
        return

    M = rows - wq - 1
    n_u = hq * wq - wq - 1
    acc = None
    for u in range(3):
        off = (u // 2) * wq
        contrib = jax.lax.dot_general(
            z1w_ref[u % 2, off : off + M, :], w2_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = contrib if acc is None else acc + contrib
    z2 = acc.astype(jnp.float32) * sw2_ref[:].astype(jnp.float32)
    z2 = jnp.maximum(z2 + b2_ref[:].astype(jnp.float32), 0.0)
    z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)
    if phase == 2:
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[0:M, 0:c] = z2
        return

    for k in range(bt):
        base = k * hq * wq
        obase = k * hp2 * wp2 + wp2 + 1
        chunk = n_u
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, n_u, chunk):
            n = min(chunk, n_u - lo)
            y = jax.lax.dot_general(
                jax.lax.slice_in_dim(z2, base + lo, base + lo + n, axis=0),
                w3_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
            y = y + b3_ref[:].astype(jnp.float32)
            sc = jax.lax.dot_general(
                pl_ref[3, base + lo : base + lo + n, :], wd_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y + (
                sc.astype(jnp.float32) * swd_ref[:].astype(jnp.float32)
                + bd_ref[:].astype(jnp.float32)
            )
            y = jnp.maximum(y, 0.0)
            o_ref[obase + lo : obase + lo + n, :] = jnp.clip(
                jnp.round(y), -127.0, 127.0
            ).astype(jnp.int8)


def probe(xr, q, *, b, h, w_sp, phase):
    hp, wp = chain_meta(0, h, w_sp)
    cin = xr.shape[-1]
    c = q["w1q"].shape[-1]
    c4 = q["w3q"].shape[-1]
    oh, ow = h // 2, w_sp // 2
    hp2, wp2 = chain_meta(0, oh, ow)
    hq, wq = hp // 2, wp // 2
    bt = _pick_bt_ds_s2(b, hq, wq, cin, c, c4)

    planes = (
        xr.reshape(b, hq, 2, wq, 2, cin)
        .transpose(2, 4, 0, 1, 3, 5)
        .reshape(4, b * hq * wq, cin)
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hq * wq, 1), 0)
    i, j = row_ids // wq, row_ids % wq
    masks = jnp.stack(
        [((2 * i + ph - 1 >= 0) & (2 * i + ph - 1 < h)
          & (2 * j + pw - 1 >= 0) & (2 * j + pw - 1 < w_sp)).astype(jnp.float32)
         for ph in range(2) for pw in range(2)]
    )
    masks_t = jnp.tile(masks, (1, bt, 1))
    one = jnp.float32(1.0)
    a1 = (q["sw1"] * one)[None, :]
    c1 = q["b1"][None, :]
    a2 = (q["sw2"] * one)[None, :]
    c2 = q["b2"][None, :]
    a3 = (q["sw3"] * one)[None, :]
    c3 = q["b3"][None, :]
    ad = (q["swd"] * one)[None, :]
    cd = q["bd"][None, :]

    rows = bt * hq * wq
    rows_out = bt * hp2 * wp2
    return pl.pallas_call(
        functools.partial(
            _probe_kernel,
            bt=bt, hq=hq, wq=wq, hp2=hp2, wp2=wp2, c=c, c4=c4, phase=phase,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((4, rows, cin), lambda i: (0, i, 0)),
            pl.BlockSpec((cin, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((cin, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((4, rows, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows_out, c4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp2 * wp2, c4), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, rows, 3 * c), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(
        planes, q["w1q"], c1, q["w2q"].reshape(3, 3 * c, c), c2,
        q["w3q"], c3, q["wdq"], cd, masks_t, a1, a2, a3, ad,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="all")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    keys = list(SHAPES) if args.shape == "all" else [args.shape]
    rng = np.random.default_rng(0)
    names = ["p0 copy", "p1 +g1", "p2 +g2", "p3 full"]

    for key in keys:
        h, cin, c = SHAPES[key]
        c4 = 4 * c
        g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
        blk = {
            "conv1": {"weight": g(cin, c), "bias": g(c)},
            "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
            "conv3": {"weight": g(c, c4), "bias": g(c4)},
            "downsample": {"weight": g(cin, c4), "bias": g(c4)},
        }
        q = quantize_ds_block(blk)
        hp, wp = chain_meta(0, h, h)
        xr = jnp.asarray(
            rng.integers(-127, 128, (args.batch * hp * wp, cin)), jnp.int8
        )
        print(f"-- {key} {h}x{h} cin={cin} c={c}", flush=True)
        prev = 0.0
        for phase, name in enumerate(names):
            fn = lambda xx, _p=phase: probe(
                xx, q, b=args.batch, h=h, w_sp=h, phase=_p
            )
            sec = chained_seconds_per_iter(fn, xr, iters=16)
            print(f"   {name}: {sec*1e3:7.3f} ms  (+{(sec-prev)*1e3:6.3f})",
                  flush=True)
            prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
