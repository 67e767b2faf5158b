#!/usr/bin/env python
"""Per-segment e2e profile of the folded serving forward (honest harness).

Times successive PREFIXES of forward_folded (stem, maxpool, each stage split
into downsample-block / remaining-blocks, head) with the chained fori_loop
harness, then differences consecutive prefixes — RTT and dispatch cancel in
the marginal math, so the diffs are pure device time per segment.

Usage: python tools/profile_e2e.py [--model resnet50] [--batch 256]
                                   [--backend xla|pallas|pallas_block]
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

from resnetc_tpu.models import resnet
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.tensor import BF16


def prefix_fn(cfg, folded, cut, policy=BF16, backend="xla"):
    """forward_folded truncated after `cut` segments; returns x -> activation."""

    def fn(x):
        segs = 0
        y = x.astype(policy.compute)
        y = resnet._folded_conv(y, folded["conv1"], stride=2, padding=3, act=True, policy=policy)
        segs += 1
        if segs >= cut:
            return y
        y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)
        segs += 1
        if segs >= cut:
            return y
        for stage in range(4):
            blocks = folded[f"layer{stage + 1}"]
            stage_stride = 1 if stage == 0 else 2
            b = 0
            # segment: block 0 (the downsample block)
            y = _block(cfg, blocks["0"], y, stage_stride, policy, backend)
            segs += 1
            if segs >= cut:
                return y
            # segment: the remaining stride-1 blocks of the stage
            if backend == "pallas_block" and cfg.block == "bottleneck":
                from resnetc_tpu.ops.pallas.block import (
                    bottleneck_block_chained, pad_for_chain, unpad_from_chain,
                )

                bsz, h, w_sp, _ = y.shape
                yr = pad_for_chain(y)
                for b in range(1, cfg.stage_blocks[stage]):
                    blk = blocks[str(b)]
                    yr = bottleneck_block_chained(
                        yr,
                        blk["conv1"]["weight"].astype(policy.compute), blk["conv1"]["bias"],
                        blk["conv2"]["weight"].astype(policy.compute), blk["conv2"]["bias"],
                        blk["conv3"]["weight"].astype(policy.compute), blk["conv3"]["bias"],
                        h=h, w_sp=w_sp,
                    )
                y = unpad_from_chain(yr, bsz, h, w_sp)
            else:
                for b in range(1, cfg.stage_blocks[stage]):
                    y = _block(cfg, blocks[str(b)], y, 1, policy, backend)
            segs += 1
            if segs >= cut:
                return y
        feats = lax_ops.global_avg_pool(y)
        logits = lax_ops.linear(
            feats.astype(policy.compute),
            folded["fc"]["weight"].astype(policy.compute),
            folded["fc"]["bias"],
        )
        return logits.astype(policy.output)

    return fn


def _block(cfg, blk, y, s, policy, backend):
    if cfg.block == "bottleneck":
        z = resnet._folded_conv(y, blk["conv1"], stride=1, padding=0, act=True, policy=policy)
        z = resnet._folded_conv(z, blk["conv2"], stride=s, padding=1, act=True, policy=policy)
        z = resnet._folded_conv(z, blk["conv3"], stride=1, padding=0, act=False, policy=policy)
    else:
        z = resnet._folded_conv(y, blk["conv1"], stride=s, padding=1, act=True, policy=policy)
        z = resnet._folded_conv(z, blk["conv2"], stride=1, padding=1, act=False, policy=policy)
    short = (
        resnet._folded_conv(y, blk["downsample"], stride=s, padding=0, act=False, policy=policy)
        if "downsample" in blk
        else y
    )
    return lax_ops.relu(lax_ops.add(z, short))


SEG_NAMES = [
    "stem 7x7/2",
    "maxpool 3x3/2",
    "layer1 block0 (ds)", "layer1 rest",
    "layer2 block0 (ds)", "layer2 rest",
    "layer3 block0 (ds)", "layer3 rest",
    "layer4 block0 (ds)", "layer4 rest",
    "head (gap+fc)",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    cfg = resnet.get_config(args.model)
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 224, 224, 3), dtype=np.float32
        ),
        jnp.bfloat16,
    )

    print(f"{args.model} b={args.batch} backend={args.backend} "
          f"({jax.devices()[0].platform})", flush=True)
    prev = 0.0
    total = None
    for cut in range(1, len(SEG_NAMES) + 1):
        fn = prefix_fn(cfg, folded, cut, backend=args.backend)
        sec = chained_seconds_per_iter(fn, x, iters=args.iters)
        seg_ms = (sec - prev) * 1e3
        print(f"  {SEG_NAMES[cut - 1]:<22} {seg_ms:7.3f} ms  (prefix {sec * 1e3:7.3f})",
              flush=True)
        prev = sec
        total = sec
    print(f"  total {total * 1e3:.3f} ms  -> {args.batch / total:.0f} img/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
