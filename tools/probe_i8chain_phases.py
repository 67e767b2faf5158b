#!/usr/bin/env python
"""Attribute int8 chained-megakernel time to its phases (honest harness).

Phases of ops/pallas/block.py::_chained_kernel_int8, cumulative:

  p0 copy   : x rows -> out rows (DMA + store floor)
  p1 +g1    : + conv1 int8 GEMM + fused epilogue (folded scales, mask mul)
  p2 +ilv   : + the kw-interleave stores into scratch
  p3 +g2    : + the one-pass packed 3x3 int8 GEMM + three slice-adds
  p4 full   : + conv3 chunked GEMM + residual + relu + requant (production)

Usage: python tools/probe_i8chain_phases.py [--shape 56|28|14|7|all] [--bt N]
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
    _pick_bt_chain_int8,
    chain_meta,
    pad_for_chain,
    quantize_chain_block,
)
from resnetc_tpu.ops.pallas.quant import quantize_with_scale
from resnetc_tpu.utils.timing import chained_seconds_per_iter

SHAPES = {
    "56": (56, 64, 256),
    "28": (28, 128, 512),
    "14": (14, 256, 1024),
    "7": (7, 512, 2048),
}


def _probe_kernel(
    x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    sw1_ref, sw2p_ref, sw3_ref, s_ref,
    o_ref, z1_ref,
    *, bt, hp, wp, c, c4, phase,
):
    rows = bt * hp * wp
    s_res = s_ref[0]

    if phase == 0:
        o_ref[:] = x_ref[:]
        return

    z1 = jax.lax.dot_general(
        x_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z1 = jnp.maximum(
        z1.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
        + b1_ref[:].astype(jnp.float32),
        0.0,
    )
    z1 = z1 * mask_ref[:]
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)
    if phase == 1:
        o_ref[:, 0:c] = z1
        o_ref[:, c:] = x_ref[:, c:]
        return

    z1_ref[0 : wp + 8, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)
    z1_ref[rows + wp - 8 : rows + 2 * wp, :] = jnp.zeros(
        (wp + 8, 3 * c), z1_ref.dtype
    )
    for kw in range(3):
        z1_ref[wp + 1 - kw : wp + 1 - kw + rows, kw * c : (kw + 1) * c] = z1
    if phase == 2:
        o_ref[:, 0:c] = z1_ref[0:rows, 0:c]
        o_ref[:, c:] = x_ref[:, c:]
        return

    P = jax.lax.dot_general(
        z1_ref[:], w2p_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc2 = (
        jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
        * sw2p_ref[0:1, :].astype(jnp.float32)
        + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
        * sw2p_ref[1:2, :].astype(jnp.float32)
        + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)).astype(jnp.float32)
        * sw2p_ref[2:3, :].astype(jnp.float32)
    )
    z2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0)
    z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)
    if phase == 3:
        o_ref[:, 0:c] = z2
        o_ref[:, c:] = x_ref[:, c:]
        return

    chunk = rows
    while chunk > 1024 and chunk % 2 == 0:
        chunk //= 2
    for lo in range(0, rows, chunk):
        y = jax.lax.dot_general(
            jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
            w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32) * s_res
        y = jnp.maximum(y, 0.0)
        o_ref[lo : lo + chunk, :] = jnp.clip(
            jnp.round(y), -127.0, 127.0
        ).astype(jnp.int8)


def probe(xr, q, *, h, w_sp, phase, bt=None):
    c = q["w1q"].shape[-1]
    c4 = q["w3q"].shape[-1]
    hp, wp = chain_meta(0, h, w_sp)
    total_rows = xr.shape[0]
    b = total_rows // (hp * wp)
    bt = bt or _pick_bt_chain_int8(b, hp, wp, c, c4)
    rows = bt * hp * wp

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_t = jnp.tile(mask, (bt, 1))
    one = jnp.ones((1,), jnp.float32)

    return pl.pallas_call(
        functools.partial(
            _probe_kernel, bt=bt, hp=hp, wp=wp, c=c, c4=c4, phase=phase,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c4), lambda i: (i, 0)),
            pl.BlockSpec((c4, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((rows, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], c4), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * c), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # Match the production kernels (block.py): Mosaic's default 16MB
            # scoped-VMEM cap OOMs this probe at the current bt picks.
            vmem_limit_bytes=100 * 2**20,
        ),
    )(
        xr, q["w1q"], q["b1"][None, :] , q["w2pq"], q["b2"][None, :],
        q["w3q"], q["b3"][None, :], mask_t,
        q["sw1"][None, :], q["sw2p"].reshape(3, c), q["sw3"][None, :], one,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="all")
    ap.add_argument("--bt", type=int, default=None)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    keys = list(SHAPES) if args.shape == "all" else [args.shape]
    rng = np.random.default_rng(0)
    names = ["p0 copy", "p1 +g1", "p2 +ilv", "p3 +g2", "p4 full"]

    for key in keys:
        hw, c, c4 = SHAPES[key]
        blk = {
            "conv1": {"weight": jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.05),
                      "bias": jnp.asarray(rng.standard_normal(c, dtype=np.float32) * 0.1)},
            "conv2": {"weight": jnp.asarray(rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05),
                      "bias": jnp.asarray(rng.standard_normal(c, dtype=np.float32) * 0.1)},
            "conv3": {"weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.05),
                      "bias": jnp.asarray(rng.standard_normal(c4, dtype=np.float32) * 0.1)},
        }
        q = quantize_chain_block(blk)
        x = rng.standard_normal((args.batch, hw, hw, c4), dtype=np.float32)
        xr = pad_for_chain(quantize_with_scale(jnp.asarray(x), jnp.float32(0.03)))
        print(f"-- {hw}x{hw} c={c} (b{args.batch})", flush=True)
        prev = 0.0
        for phase, name in enumerate(names):
            fn = lambda xx, _p=phase: probe(xx, q, h=hw, w_sp=hw, phase=_p, bt=args.bt)
            sec = chained_seconds_per_iter(fn, xr, iters=16)
            print(f"   {name}: {sec*1e3:7.3f} ms  (+{(sec-prev)*1e3:6.3f})", flush=True)
            prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
