#!/usr/bin/env python
"""Per-block megakernel vs XLA bench (the round-2 perf iteration harness).

Measures one stride-1 bottleneck residual block — conv1x1 -> conv3x3 ->
conv1x1 + residual, all bias+ReLU folded — at the four ResNet-50 stage
shapes, batch 256 bf16, with the honest chained-loop harness
(utils/timing.py; naive timings are garbage on this host, PERF.md).

Usage:
  python tools/bench_block.py                  # all shapes, xla + mega
  python tools/bench_block.py --shape 56 --variant mega
  python tools/bench_block.py --batch 64 --iters 12
"""

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

# (H=W, c, c4)
SHAPES = {
    "56": (56, 64, 256),
    "28": (28, 128, 512),
    "14": (14, 256, 1024),
    "7": (7, 512, 2048),
}


def make_inputs(hw: int, c: int, c4: int, batch: int):
    r = np.random.default_rng(0)
    x = jnp.asarray(
        r.standard_normal((batch, hw, hw, c4), dtype=np.float32), jnp.bfloat16
    )
    w1 = jnp.asarray(r.standard_normal((c4, c), dtype=np.float32) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(
        r.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05, jnp.bfloat16
    )
    w3 = jnp.asarray(r.standard_normal((c, c4), dtype=np.float32) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
    b2 = jnp.asarray(r.standard_normal(c, dtype=np.float32) * 0.1)
    b3 = jnp.asarray(r.standard_normal(c4, dtype=np.float32) * 0.1)
    return x, w1, b1, w2, b2, w3, b3


def xla_block(x, w1, b1, w2, b2, w3, b3):
    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, (1, 1, x.shape[-1], w1.shape[-1]),
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w1.reshape(1, 1, *w1.shape), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b1, 0).astype(x.dtype)
    dn2 = lax.conv_dimension_numbers(y.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=dn2,
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b2, 0).astype(x.dtype)
    dn3 = lax.conv_dimension_numbers(y.shape, (1, 1, *w3.shape), ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        y, w3.reshape(1, 1, *w3.shape), (1, 1), "SAME", dimension_numbers=dn3,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + b3 + x.astype(jnp.float32), 0).astype(x.dtype)


def run_variant(variant: str, args_tuple, *, bt=None, chain=1):
    x, w1, b1, w2, b2, w3, b3 = args_tuple
    if variant == "xla":
        def fn(xx):
            for _ in range(chain):
                xx = xla_block(xx, w1, b1, w2, b2, w3, b3)
            return xx
        return fn
    if variant == "mega":
        from resnetc_tpu.ops.pallas.block import bottleneck_block_fused

        def fn(xx):
            for _ in range(chain):
                xx = bottleneck_block_fused(xx, w1, b1, w2, b2, w3, b3, bt=bt)
            return xx
        return fn
    if variant == "chained":
        from resnetc_tpu.ops.pallas.block import (
            bottleneck_block_chained,
            pad_for_chain,
            unpad_from_chain,
        )

        b, h, w_sp, _ = x.shape

        def fn(xx):
            xr = pad_for_chain(xx)
            for _ in range(chain):
                xr = bottleneck_block_chained(
                    xr, w1, b1, w2, b2, w3, b3, h=h, w_sp=w_sp, bt=bt
                )
            return unpad_from_chain(xr, b, h, w_sp)
        return fn
    if variant == "chained_i8":
        import jax.numpy as jnp

        from resnetc_tpu.ops.pallas.block import (
            bottleneck_block_chained_int8,
            pad_for_chain,
            quantize_chain_block,
            unpad_from_chain,
        )
        from resnetc_tpu.ops.pallas.quant import quantize_with_scale

        b, h, w_sp, _ = x.shape
        q = quantize_chain_block(
            {
                "conv1": {"weight": w1, "bias": b1},
                "conv2": {"weight": w2, "bias": b2},
                "conv3": {"weight": w3, "bias": b3},
            }
        )
        # Representative static scales (random-normal activations).
        s = jnp.float32(4.0 / 127.0)
        scale_vec = jnp.stack([s, s, s, s])

        def fn(xx):
            xr = pad_for_chain(quantize_with_scale(xx, s))
            for i in range(chain):
                xr = bottleneck_block_chained_int8(
                    xr,
                    q["w1q"], q["sw1"], q["b1"],
                    q["w2pq"], q["sw2p"], q["b2"],
                    q["w3q"], q["sw3"], q["b3"],
                    scale_vec,
                    h=h, w_sp=w_sp, emit_i8=(i + 1 < chain), bt=bt,
                )
            return unpad_from_chain(xr, b, h, w_sp)
        return fn
    raise SystemExit(f"unknown variant {variant}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=list(SHAPES) + ["all"], default="all")
    ap.add_argument("--variant", default="xla,mega")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--bt", type=int, default=None)
    ap.add_argument("--chain", type=int, default=1, help="apply the block N times per step")
    ap.add_argument("--check", action="store_true", help="also verify numerics vs xla")
    args = ap.parse_args()

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    shapes = list(SHAPES) if args.shape == "all" else [args.shape]
    variants = args.variant.split(",")
    print(f"batch={args.batch} bf16, {jax.devices()[0].platform}")
    for sh in shapes:
        hw, c, c4 = SHAPES[sh]
        inputs = make_inputs(hw, c, c4, args.batch)
        x = inputs[0]
        row = [f"{sh}^2 c={c}"]
        ref = None
        for v in variants:
            try:
                fn = run_variant(v, inputs, bt=args.bt, chain=args.chain)
                if args.check:
                    got = np.asarray(fn(x), np.float32)
                    if ref is None and v != "xla":
                        ref = np.asarray(run_variant("xla", inputs, chain=args.chain)(x), np.float32)
                    if v != "xla" and ref is not None:
                        err = float(np.mean(np.abs(got - ref))) / (
                            float(np.mean(np.abs(ref))) or 1.0
                        )
                        row.append(f"[{v} rel_mae {err:.2e}]")
                sec = chained_seconds_per_iter(fn, x, iters=args.iters)
                row.append(f"{v}={sec * 1e3 / args.chain:.3f}ms/blk")
            except Exception as e:
                row.append(f"{v}=ERR({type(e).__name__}: {str(e)[:120]})")
        print("  ".join(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
