#!/usr/bin/env python
"""CHAIN_PIPE_DMA isolated A/B: auto-pipelined vs fully-manual pipe kernel.

Times bottleneck_block_chained_int8 auto vs pipe_dma=True (and mdma for
reference) at the production chain geometries (b256 ResNet-50 L1-L4),
ADJACENTLY PAIRED per geometry (the machine's DMA weather drifts on
tens-of-minutes scales; only paired rankings are decision-grade).

The question (PERF.md round 3): the chain kernels measure DMA + compute
SERIAL per grid step; the input-only mdma variant was neutral, so the pipe
variant manualizes the OUTPUT stream too.  If pipe ~= auto here as well,
the serialization is NOT the window machinery on either side and the
per-grid-step overhead story closes as irreducible on this Mosaic version.

Usage: python tools/battery/pipe_ab.py [--batch 256] [--repeats 5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.block import (
    bottleneck_block_chained_int8,
    chain_meta,
    quantize_chain_block,
    quantize_ds_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter

# (label, h, cin, c, projection?) — the b256 ResNet-50 chain-kernel sites.
GEOMS = [
    ("L1b1 chain 56x56 c=64", 56, 256, 64, False),
    ("L1b0 s1-ds 56x56 c=64", 56, 64, 64, True),
    ("L2 chain 28x28 c=128", 28, 512, 128, False),
    ("L3 chain 14x14 c=256", 14, 1024, 256, False),
    ("L4 chain 7x7 c=512", 7, 2048, 512, False),
]


def build(rng, b, h, cin, c, proj):
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
    }
    q = quantize_chain_block(blk)
    kw = {}
    if proj:
        qd = quantize_ds_block(
            dict(blk, downsample={"weight": g(cin, c4), "bias": g(c4)})
        )
        kw = dict(wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)
    return q, scales, xr, kw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--mdma", action="store_true", help="also time manual_dma")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    for label, h, cin, c, proj in GEOMS:
        q, scales, xr, kw = build(rng, args.batch, h, cin, c, proj)

        def run(variant_kw):
            def fn(salt):
                s = scales + jnp.sum(salt) * 1e-30
                out = bottleneck_block_chained_int8(
                    xr, q["w1q"], q["sw1"], q["b1"],
                    q["w2pq"], q["sw2p"], q["b2"],
                    q["w3q"], q["sw3"], q["b3"], s,
                    h=h, w_sp=h, emit_i8=True, **kw, **variant_kw,
                )
                return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

            return chained_seconds_per_iter(
                fn, jnp.zeros((8, 8), jnp.float32),
                iters=args.iters, repeats=args.repeats,
            )

        variants = [("auto", {}), ("pipe", {"pipe_dma": True})]
        if args.mdma and not proj:
            variants.append(("mdma", {"manual_dma": True}))
        # Adjacent pairing: measure each variant, then re-measure the first
        # as the weather control for the pair.
        results = {}
        try:
            for name, vkw in variants:
                results[name] = run(vkw)
            ctrl = run({})  # paired control re-measure of auto
        except Exception as e:
            print(f"{label}: FAIL {type(e).__name__}: {e}", flush=True)
            continue
        base = min(results["auto"], ctrl)
        line = " ".join(
            f"{name} {sec * 1e3:.3f}ms" for name, sec in results.items()
        )
        print(
            f"{label}: {line} ctrl {ctrl * 1e3:.3f}ms "
            f"-> pipe/auto {results['pipe'] / base:.3f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
