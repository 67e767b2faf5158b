#!/usr/bin/env python
"""Per-block profile of the int8 chained pipeline (honest harness).

Times prefixes of fused_forward_int8_chain cut after the stem, the maxpool,
the entry quantize+pad, and every block kernel; consecutive diffs attribute
device time per segment.  Finds where the e2e int8 path loses time that the
per-block benches don't show (XLA boundary passes, plane gathers, ...).

Usage: python tools/profile_i8chain.py [--batch 256]
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
from resnetc_tpu.ops.pallas import fused
from resnetc_tpu.ops.pallas.block import (
    bottleneck_block_chained_int8,
    downsample_block_s2_int8,
    pad_for_chain,
    unpad_from_chain,
)
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.ops.pallas.fused import _conv
from resnetc_tpu.ops.pallas.quant import quantize_with_scale
from resnetc_tpu.tensor import BF16


def build_prefix(cfg, qtree, chain_scales, cut, policy=BF16, pp=False):
    """Prefix of fused_forward_int8_chain after `cut` segments.  Segment 1 =
    stem, 2 = maxpool, 3 = quantize+pad entry, 4.. = one block each.

    ``pp``: serve stage-0 blocks with the pixel-paired per-block kernels —
    the decomposable proxy for the TUNED engine (whose stage 0 is the pp
    RUN kernel; a run can't take prefix cuts mid-kernel)."""

    def site(stage, b):
        return chain_scales[f"layer{stage + 1}"][str(b)]

    def s_after(stage, b):
        if b + 1 < cfg.stage_blocks[stage]:
            return site(stage, b + 1)["in"]
        if stage + 1 < 4:
            return site(stage + 1, 0)["in"]
        return None

    def fn(x):
        segs = 0
        y = x.astype(policy.compute)
        y = _conv(x, qtree["conv1"], stride=2, relu=True, policy=policy, interpret=False)
        segs += 1
        if segs >= cut:
            return y
        yq = quantize_with_scale(y, site(0, 0)["in"])
        yq = lax_ops.max_pool2d(yq, kernel_size=3, stride=2, padding=1)
        segs += 1
        if segs >= cut:
            return yq.astype(jnp.bfloat16)
        bsz, h, w_sp, _ = yq.shape
        yr = pad_for_chain(yq)
        segs += 1
        if segs >= cut:
            return yr.astype(jnp.bfloat16)
        for stage in range(4):
            blocks = qtree[f"layer{stage + 1}"]
            for b in range(cfg.stage_blocks[stage]):
                blk = blocks[str(b)]
                st = site(stage, b)
                s_y = s_after(stage, b)
                last = s_y is None or segs + 1 >= cut
                scale_vec = jnp.stack(
                    [st["in"], st["z1"], st["z2"],
                     s_y if s_y is not None else jnp.float32(1.0)]
                ).astype(jnp.float32)
                if b == 0 and stage > 0:
                    yr = downsample_block_s2_int8(
                        yr,
                        blk["w1q"], blk["sw1"], blk["b1"],
                        blk["w2q"], blk["sw2"], blk["b2"],
                        blk["w3q"], blk["sw3"], blk["b3"],
                        blk["wdq"], blk["swd"], blk["bd"],
                        scale_vec, h=h, w_sp=w_sp, emit_i8=not last,
                    )
                    h, w_sp = (h + 1) // 2, (w_sp + 1) // 2
                else:
                    blk_fn = bottleneck_block_chained_int8
                    if pp and stage == 0 and blk["w1q"].shape[-1] == 64:
                        from resnetc_tpu.ops.pallas.block import (
                            bottleneck_block_chained_int8_pp,
                        )

                        blk_fn = bottleneck_block_chained_int8_pp
                    yr = blk_fn(
                        yr,
                        blk["w1q"], blk["sw1"], blk["b1"],
                        blk["w2pq"], blk["sw2p"], blk["b2"],
                        blk["w3q"], blk["sw3"], blk["b3"],
                        scale_vec, h=h, w_sp=w_sp, emit_i8=not last,
                        wdq=blk.get("wdq"), swd=blk.get("swd"), bd=blk.get("bd"),
                    )
                segs += 1
                if segs >= cut:
                    return unpad_from_chain(yr, bsz, h, w_sp).astype(jnp.bfloat16)
        return unpad_from_chain(yr, bsz, h, w_sp).astype(jnp.bfloat16)

    return fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--start", type=int, default=1)
    ap.add_argument("--stop", type=int, default=99)
    args = ap.parse_args()

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    cfg = resnet.get_config("resnet50")
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    calib = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 224, 224, 3), dtype=np.float32)
    )
    scales = fused.calibrate_chain_scales(cfg, folded, calib)
    qtree = fused.quantize_chain(cfg, folded)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 224, 224, 3), dtype=np.float32
        ),
        jnp.bfloat16,
    )

    names = ["stem", "maxpool", "quant+pad"]
    for stage in range(4):
        for b in range(cfg.stage_blocks[stage]):
            kind = "s2-ds" if (b == 0 and stage > 0) else ("s1-ds" if b == 0 else "chain")
            names.append(f"L{stage + 1}b{b} {kind}")

    prev = 0.0
    for cut in range(1, len(names) + 1):
        if cut < args.start or cut > args.stop:
            continue
        fn = build_prefix(cfg, qtree, scales, cut)
        sec = chained_seconds_per_iter(fn, x, iters=args.iters)
        print(f"  {names[cut - 1]:<16} {(sec - prev) * 1e3:7.3f} ms  "
              f"(prefix {sec * 1e3:7.3f})", flush=True)
        prev = sec
    print(f"  total {prev * 1e3:.3f} ms -> {args.batch / prev:.0f} img/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
