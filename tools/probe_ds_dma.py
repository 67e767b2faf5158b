#!/usr/bin/env python
"""A/B the ds megakernel's phase-plane gather patterns (pure DMA, no conv).

The stride-2 downsample kernels (ops/pallas/block.py::_ds_block_s2_kernel)
gather four (bt, hq, wq, cin) phase planes per grid step with strided
`pltpu.make_async_copy` from the ANY-space chain buffer viewed
(B, hq, 2, wq, 2*cin).  Slicing BOTH the ph major dim and the pw lane slot
makes the innermost contiguous run cin bytes (256 B at L2ds) — the
fine-grained class.  The alternative gathers only the two ph halves
(innermost run wq*2*cin = 15-32 KB) and leaves the pw split to the compute
phases (aligned lane slices: cin is a 128-multiple at every ds stage).

This probe measures JUST the gather cost of both patterns per stage so the
restructure decision is data, not intuition (see PERF.md round-2 lessons:
phase probes beat intuition).  Salted chained harness per
tools/bench_chain_blocks.py; run with JAX_COMPILATION_CACHE_DIR set.

Usage: python tools/probe_ds_dma.py [--stages L2,L3,L4] [--iters 16]
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

from resnetc_tpu.ops.pallas.block import _pick_bt_ds_s2, chain_meta
from resnetc_tpu.utils.timing import chained_seconds_per_iter

# (input h to the ds block, cin, c) at batch-256 ResNet-50 geometry.
STAGES = {"L2": (56, 256, 128), "L3": (28, 512, 256), "L4": (14, 1024, 512)}
B = 256


def _gather_kernel(x6_ref, salt_ref, o_ref, pl_ref, dma_sems, *, bt, mode):
    """mode='planes': 4 DMAs slicing ph + the pw lane slot (production
    pattern).  mode='pairs': 2 DMAs slicing ph only (pw stays interleaved in
    lanes).  Both double-buffer across grid steps exactly like the ds kernel.
    """
    i = pl.program_id(0)
    n = 4 if mode == "planes" else 2
    cin = x6_ref.shape[-1] // 2

    def dma(step, buf, p):
        if mode == "planes":
            ph, pw = p // 2, p % 2
            src = x6_ref.at[
                pl.ds(step * bt, bt), :, ph, :, pl.ds(pw * cin, cin)
            ]
        else:
            src = x6_ref.at[pl.ds(step * bt, bt), :, p]
        return pltpu.make_async_copy(src, pl_ref.at[buf, p], dma_sems.at[buf, p])

    @pl.when(i == 0)
    def _():
        for p in range(n):
            dma(0, 0, p).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        for p in range(n):
            dma(i + 1, (i + 1) % 2, p).start()

    cur = i % 2
    for p in range(n):
        dma(i, cur, p).wait()

    # Touch the landed data so the gather is observable; tiny output only.
    flat = pl_ref[cur].reshape(-1, pl_ref.shape[-1])
    o_ref[:] = (
        salt_ref[:]
        + flat[0:8, 0:8].astype(jnp.float32)
        + flat[flat.shape[0] - 8 :, 0:8].astype(jnp.float32)
    )


def gather(
    x6: jax.Array, salt: jax.Array, *, bt: int, mode: str,
    interpret: bool = False,
) -> jax.Array:
    b, hq, two, wq, cin2 = x6.shape
    cin = cin2 // 2
    if mode == "planes":
        buf_shape = (2, 4, bt, hq, wq, cin)
    else:
        buf_shape = (2, 2, bt, hq, wq, cin2)
    return pl.pallas_call(
        functools.partial(_gather_kernel, bt=bt, mode=mode),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 8), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(buf_shape, jnp.int8),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x6, salt)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="L2,L3,L4")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--interpret-check", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.interpret_check:
        # Correctness pass of both gather modes (small shapes, interpret).
        h, cin, c = STAGES["L2"]
        hp, wp = chain_meta(0, h, h)
        xr = jnp.asarray(
            rng.integers(-127, 128, (4 * hp * wp, cin)), jnp.int8
        )
        x6 = xr.reshape(4, hp // 2, 2, wp // 2, 2 * cin)
        salt = jnp.zeros((8, 8), jnp.float32)
        for mode in ("planes", "pairs"):
            out = gather(x6, salt, bt=2, mode=mode, interpret=True)
            assert np.isfinite(np.asarray(out)).all(), mode
            print(f"interpret-check mode={mode}: ok", flush=True)
        return
    for name in args.stages.split(","):
        h, cin, c = STAGES[name]
        hp, wp = chain_meta(0, h, h)
        hq, wq = hp // 2, wp // 2
        bt = _pick_bt_ds_s2(B, hq, wq, cin, c, 4 * c)
        xr = jnp.asarray(
            rng.integers(-127, 128, (B * hp * wp, cin)), jnp.int8
        )
        x6 = xr.reshape(B, hq, 2, wq, 2 * cin)
        mb = B * hp * wp * cin / 2**20
        for mode in ("planes", "pairs"):
            run_b = (wq * 2 * cin if mode == "pairs" else cin)

            def fn(salt, mode=mode):
                return gather(x6, salt, bt=bt, mode=mode)

            try:
                sec = chained_seconds_per_iter(
                    fn, jnp.zeros((8, 8), jnp.float32), iters=args.iters
                )
                print(
                    f"{name} ds gather mode={mode:6s} bt={bt}: "
                    f"{sec*1e3:.3f} ms  ({mb/1024/sec:.0f} GB/s over "
                    f"{mb:.0f} MB, {run_b} B runs)",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} mode={mode}: FAIL {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
