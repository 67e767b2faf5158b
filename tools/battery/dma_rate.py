"""Pin the in-kernel (Mosaic) DMA rate vs the XLA stream rate, current
machine conditions.

Motivation (r4 session 3): health2 measured the XLA elementwise stream at
448 GB/s (read+write) while the L1 chain kernel's p0 copy floor ran at only
~260 GB/s — if Pallas auto-pipelined window DMA is rate-capped below what
XLA fusions get on the same machine, the chain kernels' degradation is a
runtime/DMA-scheduling property, not a kernel-design property, and the
mitigation is traffic reduction (fusion) rather than bt/layout tuning.

Measures, on one (N, 256) int8 array (~243MB at N=950272):
  - xla copy      : jnp scale-copy (XLA fusion; the achievable ceiling)
  - pallas copy   : o_ref[:] = x_ref[:] at several bt (auto-pipeline)
  - pallas read   : full window in, (8,128) summary out (read-only rate)
  - pallas write  : constant fill, no input stream (write-only rate)

All via the salted chained harness.  GB/s counts the bytes that actually
cross HBM for each case (read+write for copies, one direction otherwise).

Usage: python tools/battery/dma_rate.py [--rows 950272] [--iters 16]
"""
import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnetc_tpu.utils.timing import chained_seconds_per_iter

C = 256


def _copy_kernel(x_ref, s_ref, o_ref):
    # The salt lands in one tile only; everything else is a pure copy.
    # (i8 vector adds are unsupported in Mosaic: widen to i32, then cast.)
    o_ref[:] = x_ref[:]
    o_ref[0:8, 0:128] = (
        x_ref[0:8, 0:128].astype(jnp.int32) + s_ref[0:8, 0:128].astype(jnp.int32)
    ).astype(jnp.int8)


def _read_kernel(x_ref, s_ref, o_ref):
    # Consume the whole window so the read cannot be narrowed; emit (8,128).
    acc = jnp.sum(x_ref[:].astype(jnp.int32), axis=0, keepdims=True)
    o_ref[:] = jnp.broadcast_to(acc[:, 0:128], (8, 128)) + s_ref[
        0:8, 0:128
    ].astype(jnp.int32)


def _write_kernel(s_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[0:8, 0:128] = s_ref[0:8, 0:128].astype(jnp.int32).astype(jnp.int8)


def _run(kind, rows, bt_rows, iters):
    grid = rows // bt_rows
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (rows, C)), jnp.int8
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 2**20,
    )
    if kind == "xla":
        # A full materialized copy whose first tile depends on the salt, so
        # the loop body can neither be elided nor narrowed.
        def fn(salt):
            y = x.at[0:8, 0:128].add(salt.astype(jnp.int8)).astype(jnp.int8)
            return jax.lax.slice(y, (0, 0), (8, 128)).astype(jnp.float32)
        gb = 2 * rows * C / 1e9
    elif kind == "copy":
        def fn(salt):
            y = pl.pallas_call(
                _copy_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((bt_rows, C), lambda i: (i, 0)),
                    pl.BlockSpec((8, 128), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((bt_rows, C), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, C), jnp.int8),
                compiler_params=params,
            )(x, salt)
            return jax.lax.slice(y, (0, 0), (8, 128)).astype(jnp.float32)
        gb = 2 * rows * C / 1e9
    elif kind == "read":
        def fn(salt):
            y = pl.pallas_call(
                _read_kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((bt_rows, C), lambda i: (i, 0)),
                    pl.BlockSpec((8, 128), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                compiler_params=params,
            )(x, salt)
            return y.astype(jnp.float32)
        gb = rows * C / 1e9
    elif kind == "write":
        def fn(salt):
            y = pl.pallas_call(
                _write_kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bt_rows, C), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, C), jnp.int8),
                compiler_params=params,
            )(salt)
            return jax.lax.slice(y, (0, 0), (8, 128)).astype(jnp.float32)
        gb = rows * C / 1e9
    else:
        raise ValueError(kind)

    sec = chained_seconds_per_iter(
        fn, jnp.zeros((8, 128), jnp.float32), iters=iters
    )
    return sec, gb / sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=950272)  # L1 chain geometry
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    sec, rate = _run("xla", args.rows, args.rows, args.iters)
    print(f"xla    copy             : {sec*1e3:7.3f} ms  {rate:6.0f} GB/s",
          flush=True)
    for bt_rows in (14848, 29696, 59392, 118784):
        if args.rows % bt_rows:
            continue
        sec, rate = _run("copy", args.rows, bt_rows, args.iters)
        print(f"pallas copy  bt_rows={bt_rows:7d}: {sec*1e3:7.3f} ms  "
              f"{rate:6.0f} GB/s", flush=True)
    for kind in ("read", "write"):
        sec, rate = _run(kind, args.rows, 59392, args.iters)
        print(f"pallas {kind:5s} bt_rows=  59392: {sec*1e3:7.3f} ms  "
              f"{rate:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
