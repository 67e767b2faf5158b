#!/usr/bin/env python
"""Attribute chained-megakernel time to its phases (honest harness).

Same methodology as probe_block_phases.py but for the padded-row-in/out
chained kernel (ops/pallas/block.py::_chained_kernel):

  p0 copy   : x rows -> out rows (DMA + store floor)
  p1 +g1    : + conv1 1x1 GEMM + mask
  p2 +ilv   : + the kw-interleave stores into scratch
  p3 +g2    : + the one-pass 3x3 GEMM + three slice-adds
  p4 full   : + conv3 chunked GEMM + residual + relu (== production kernel)

Usage: python tools/probe_chain_phases.py [--shape 56|28|14|7|all] [--bt N]
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

from resnetc_tpu.ops.pallas.block import _pick_bt_chain, chain_meta, pad_for_chain

SHAPES = {
    "56": (56, 64, 256),
    "28": (28, 128, 512),
    "14": (14, 256, 1024),
    "7": (7, 512, 2048),
}


def _probe_kernel(
    x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    o_ref, z1_ref,
    *, bt, hp, wp, c, c4, phase,
):
    rows = bt * hp * wp
    dep = None

    if phase >= 1:
        z1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        z1 = jnp.maximum(z1 + b1_ref[:].astype(jnp.float32), 0.0)
        z1 = jnp.where(
            mask_ref[:].reshape(1, hp * wp, 1) > 0, z1.reshape(bt, hp * wp, c), 0.0
        )
        z1 = z1.reshape(rows, c).astype(z1_ref.dtype)
        dep = jnp.sum(z1[0:8, :].astype(jnp.float32), axis=0, keepdims=True)

    if phase >= 2:
        z1_ref[0 : wp + 8, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)
        z1_ref[rows + wp - 8 : rows + 2 * wp, :] = jnp.zeros(
            (wp + 8, 3 * c), z1_ref.dtype
        )
        for kw in range(3):
            z1_ref[wp + 1 - kw : wp + 1 - kw + rows, kw * c : (kw + 1) * c] = z1
        dep = jnp.sum(
            z1_ref[0:8, :].astype(jnp.float32), axis=0, keepdims=True
        )[:, :c]

    if phase >= 3:
        P = jnp.dot(z1_ref[:], w2p_ref[:], preferred_element_type=jnp.float32)
        acc2 = (
            jax.lax.slice(P, (0, 0), (rows, c))
            + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c))
            + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c))
        )
        z2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0).astype(
            z1_ref.dtype
        )
        dep = jnp.sum(z2[0:8, :].astype(jnp.float32), axis=0, keepdims=True)

    if phase >= 4:
        chunk = rows
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, rows, chunk):
            y = jnp.dot(
                jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
                w3_ref[:],
                preferred_element_type=jnp.float32,
            )
            y = y + b3_ref[:].astype(jnp.float32)
            y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32)
            o_ref[lo : lo + chunk, :] = jnp.maximum(y, 0.0).astype(o_ref.dtype)
    else:
        base = x_ref[:]
        if dep is not None:
            mix = jnp.concatenate([dep] * (c4 // dep.shape[1]), axis=1)
            base = base + (mix * 1e-6).astype(base.dtype)
        o_ref[:] = base


def probe(xr, w1, b1, w2, b2, w3, b3, *, h, w_sp, phase, bt=None):
    c = w1.shape[-1]
    c4 = w1.shape[0]
    hp, wp = chain_meta(0, h, w_sp)
    b = xr.shape[0] // (hp * wp)
    bt = bt or _pick_bt_chain(b, hp, wp, c, c4)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    w2p = jnp.transpose(w2, (1, 2, 0, 3)).reshape(3 * c, 3 * c)

    rows = bt * hp * wp
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
            pl.BlockSpec((hp * wp, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c4), xr.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * c), xr.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(xr, w1, b1[None, :], w2p, b2[None, :], w3, b3[None, :], mask)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=list(SHAPES) + ["all"], default="56")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bt", type=int, default=None)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    names = ["p0 copy", "p1 +g1", "p2 +ilv", "p3 +g2", "p4 full"]
    for sh in list(SHAPES) if args.shape == "all" else [args.shape]:
        hw, c, c4 = SHAPES[sh]
        r = np.random.default_rng(0)
        x = jnp.asarray(
            r.standard_normal((args.batch, hw, hw, c4), dtype=np.float32),
            jnp.bfloat16,
        )
        xr = pad_for_chain(x)
        w1 = jnp.asarray(r.standard_normal((c4, c), dtype=np.float32) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(r.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05, jnp.bfloat16)
        w3 = jnp.asarray(r.standard_normal((c, c4), dtype=np.float32) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
        b2 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
        b3 = jnp.asarray(r.standard_normal(c4, dtype=np.float32) * 0.1)

        prev = None
        print(f"-- {sh}^2 c={c} batch={args.batch} (bt={args.bt or 'auto'})")
        for phase, name in enumerate(names):
            fn = lambda xx, _p=phase: probe(
                xx, w1, b1, w2, b2, w3, b3, h=hw, w_sp=hw, phase=_p, bt=args.bt
            )
            try:
                sec = chained_seconds_per_iter(fn, xr, iters=args.iters)
            except Exception as e:
                print(f"  {name}: ERR {type(e).__name__}: {str(e)[:100]}")
                continue
            delta = "" if prev is None else f"  (+{(sec - prev) * 1e3:.3f}ms)"
            print(f"  {name}: {sec * 1e3:.3f}ms{delta}", flush=True)
            prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
