#!/usr/bin/env python
"""Attribute megakernel time to its phases (G1 / shifts / G2 / G3).

Runs the bottleneck megakernel's tiling with phases progressively enabled:

  p0 copy   : x tile -> out tile (DMA + store floor)
  p1 g1     : + conv1 1x1 GEMM (out depends on z1 via a cheap row-sum)
  p2 shift  : + the three kw-interleaved z1 copies into scratch
  p3 g2     : + the 3x3 as three K=3c MXU passes
  p4 full   : + conv3 GEMM + residual + relu (== bottleneck_block_fused)

Marginal deltas between consecutive variants attribute device time per
phase.  The dependence chain (each variant's store mixes in a tiny row-sum
of the newest phase's result) prevents Mosaic/XLA from eliding disabled
work.  Honest timing via utils/timing.chained_seconds_per_iter.

Usage: python tools/probe_block_phases.py [--shape 56] [--batch 256] [--bt N]
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

from resnetc_tpu.ops.pallas.block import _pick_bt, _round_up

SHAPES = {
    "56": (56, 64, 256),
    "28": (28, 128, 512),
    "14": (14, 256, 1024),
    "7": (7, 512, 2048),
}


def _probe_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    o_ref, z1_ref, acc2_ref,
    *, bt, hp, wp, h, m_acc, c, c4, phase,
):
    rows = bt * hp * wp
    dep = None  # (1, width) row mixed into the store to defeat elision

    if phase >= 1:
        z1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        z1 = jnp.maximum(z1 + b1_ref[:].astype(jnp.float32), 0.0)
        z1 = z1.reshape(bt, hp * wp, c) * mask_ref[:].astype(jnp.float32)
        z1 = z1.reshape(rows, c).astype(z1_ref.dtype)
        dep = jnp.sum(z1[0:8, :].astype(jnp.float32), axis=0, keepdims=True)

    if phase >= 2:
        usable = rows - 2
        for kw in range(3):
            z1_ref[0:usable, kw * c : (kw + 1) * c] = jax.lax.slice_in_dim(
                z1, kw, kw + usable, axis=0
            )
        dep = jnp.sum(
            z1_ref[0:8, :].astype(jnp.float32), axis=0, keepdims=True
        )[:, :c]

    if phase >= 3:
        w2r = w2_ref[:].reshape(3, 3 * c, c)
        for kh in range(3):
            lhs = z1_ref[kh * wp : kh * wp + m_acc, :]
            contrib = jnp.dot(lhs, w2r[kh], preferred_element_type=jnp.float32)
            if kh == 0:
                acc2_ref[:] = contrib
            else:
                acc2_ref[:] += contrib
        z2 = jnp.maximum(
            acc2_ref[:] + b2_ref[:].astype(jnp.float32), 0.0
        ).astype(z1_ref.dtype)
        dep = jnp.sum(z2[0:8, :].astype(jnp.float32), axis=0, keepdims=True)

    if phase >= 4:
        y = jnp.dot(z2, w3_ref[:], preferred_element_type=jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        y = y + x_ref[wp + 1 : wp + 1 + m_acc, :].astype(jnp.float32)
        y = jnp.maximum(y, 0.0).astype(o_ref.dtype)
    else:
        base = x_ref[0 : bt * hp * wp, :]
        if dep is not None:
            # mix the newest phase's row-sum into the store (broadcast over
            # the c4 lanes by tiling the (1, c) dep across the c4 columns).
            mix = jnp.concatenate([dep] * (c4 // dep.shape[1]), axis=1)
            base = base + (mix * 1e-6).astype(base.dtype)
        y = base

    for bi in range(bt):
        img = jax.lax.slice_in_dim(
            y, bi * hp * wp, bi * hp * wp + h * wp, axis=0
        )
        o_ref[bi] = img.reshape(h, wp, c4)


def probe(x, w1, b1, w2, b2, w3, b3, *, phase, bt=None):
    b, h, w_sp, c4 = x.shape
    c = w1.shape[-1]
    wp = _round_up(w_sp + 2, 8)
    bt = bt or _pick_bt(b, h + 2, wp, c, c4)
    extra = 0
    while True:
        hp = h + 2 + extra
        m_acc = _round_up((bt - 1) * hp * wp + h * wp, 128)
        if m_acc + 2 * wp + 2 <= bt * hp * wp:
            break
        extra += 1
    x_pad = jnp.pad(x, ((0, 0), (1, 1 + extra), (1, wp - w_sp - 1), (0, 0)))
    x_rows = x_pad.reshape(b * hp * wp, c4)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _probe_kernel,
            bt=bt, hp=hp, wp=wp, h=h, m_acc=m_acc, c=c, c4=c4, phase=phase,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt * hp * wp, c4), lambda i: (i, 0)),
            pl.BlockSpec((c4, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((hp * wp, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, h, wp, c4), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, c4), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * hp * wp, 3 * c), x.dtype),
            pltpu.VMEM((m_acc, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x_rows, w1, b1[None, :], w2, b2[None, :], w3, b3[None, :], mask)
    return out[:, :, :w_sp, :]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=list(SHAPES) + ["all"], default="56")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bt", type=int, default=None)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    names = ["p0 copy", "p1 +g1", "p2 +shift", "p3 +g2", "p4 full"]
    for sh in list(SHAPES) if args.shape == "all" else [args.shape]:
        hw, c, c4 = SHAPES[sh]
        r = np.random.default_rng(0)
        x = jnp.asarray(
            r.standard_normal((args.batch, hw, hw, c4), dtype=np.float32),
            jnp.bfloat16,
        )
        w1 = jnp.asarray(r.standard_normal((c4, c), dtype=np.float32) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(r.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05, jnp.bfloat16)
        w3 = jnp.asarray(r.standard_normal((c, c4), dtype=np.float32) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
        b2 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
        b3 = jnp.asarray(r.standard_normal(c4, dtype=np.float32) * 0.1)

        prev = None
        print(f"-- {sh}^2 c={c} batch={args.batch}")
        for phase, name in enumerate(names):
            fn = lambda xx, _p=phase: probe(
                xx, w1, b1, w2, b2, w3, b3, phase=_p, bt=args.bt
            )
            try:
                sec = chained_seconds_per_iter(fn, x, iters=args.iters)
            except Exception as e:
                print(f"  {name}: ERR {type(e).__name__}: {str(e)[:100]}")
                continue
            delta = "" if prev is None else f"  (+{(sec - prev) * 1e3:.3f}ms)"
            print(f"  {name}: {sec * 1e3:.3f}ms{delta}", flush=True)
            prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
