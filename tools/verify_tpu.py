#!/usr/bin/env python
"""Compiled-path (Mosaic) parity gate: every Pallas kernel vs its lax oracle
ON THE REAL CHIP, one command, pass/fail artifact.

tests/test_pallas.py pins kernel semantics in interpret mode on CPU; this
script is the executed-path check the reference performs with
``check_out`` (/root/reference/pytorch_inference.py:8-11) — it catches
Mosaic tiling/masking bugs at ragged edges that interpret mode cannot see.

Run:  make verify-tpu    (or: python tools/verify_tpu.py)
Artifact: VERIFY_TPU.json at the repo root — per-check relative MAE vs gate,
process exit code 0 iff every check passes.

Gates are relative mean-absolute-error (mean|got-ref| / mean|ref|):
5e-3 for fp32-input kernels, 2.5e-2 for bf16/int8 paths.  A real tiling or
masking bug produces O(1) relative error, far beyond either gate.
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # runnable as `python tools/verify_tpu.py`
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

OUT = REPO / "VERIFY_TPU.json"

FP32_GATE = 5e-3
BF16_GATE = 2.5e-2

_CHECKS: list[tuple[str, float, callable]] = []


def check(name: str, gate: float):
    def deco(fn):
        _CHECKS.append((name, gate, fn))
        return fn

    return deco


def rel_mae(got, ref) -> float:
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    denom = float(np.mean(np.abs(ref))) or 1.0
    return float(np.mean(np.abs(got - ref))) / denom


def _rng():
    return np.random.default_rng(20260816)


# ---------------------------------------------------------------------------
# GEMM (ragged edges included: 49x2048x1000 is the fc shape, 300/130 ragged)
# ---------------------------------------------------------------------------


@check("matmul fp32 256x128x128", FP32_GATE)
def _():
    from resnetc_tpu.ops.pallas.gemm import matmul

    r = _rng()
    x = jnp.asarray(r.standard_normal((256, 128), dtype=np.float32))
    w = jnp.asarray(r.standard_normal((128, 128), dtype=np.float32) * 0.05)
    return rel_mae(matmul(x, w), np.asarray(x) @ np.asarray(w))


@check("matmul fp32 ragged 300x192x130 + epilogue", FP32_GATE)
def _():
    from resnetc_tpu.ops.pallas.gemm import matmul

    r = _rng()
    x = jnp.asarray(r.standard_normal((300, 192), dtype=np.float32))
    w = jnp.asarray(r.standard_normal((192, 130), dtype=np.float32) * 0.05)
    b = jnp.asarray(r.standard_normal((130,), dtype=np.float32))
    res = jnp.asarray(r.standard_normal((300, 130), dtype=np.float32))
    ref = np.maximum(np.asarray(x) @ np.asarray(w) + np.asarray(b) + np.asarray(res), 0)
    return rel_mae(matmul(x, w, b, res, relu=True), ref)


@check("matmul bf16 fc-shape 49x2048x1000", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas.gemm import matmul

    r = _rng()
    x = jnp.asarray(r.standard_normal((49, 2048), dtype=np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((2048, 1000), dtype=np.float32) * 0.02).astype(jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    return rel_mae(matmul(x, w, out_dtype=jnp.float32), ref)


# ---------------------------------------------------------------------------
# Convs
# ---------------------------------------------------------------------------


def _conv_ref(x, w, stride, padding):
    from resnetc_tpu.ops import lax_ops

    return np.asarray(
        lax_ops.conv2d(
            jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
            stride=stride, padding=padding,
        )
    )


@check("conv1x1_fused s1+s2 bf16 28x28x512->128", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas.conv import conv1x1_fused

    r = _rng()
    x = r.standard_normal((8, 28, 28, 512), dtype=np.float32)
    w = r.standard_normal((1, 1, 512, 128), dtype=np.float32) * 0.05
    errs = []
    for stride in (1, 2):
        ref = _conv_ref(x, w, stride, 0)
        got = conv1x1_fused(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            stride=stride, out_dtype=jnp.float32,
        )
        errs.append(rel_mae(got, ref))
    return max(errs)


@check("conv3x3_s1_fused bf16 56x56x64 + ragged 9x9x24->40", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas.conv import conv3x3_s1_fused

    r = _rng()
    errs = []
    for shape, cout in (((4, 56, 56, 64), 64), ((3, 9, 9, 24), 40)):
        x = r.standard_normal(shape, dtype=np.float32)
        w = r.standard_normal((3, 3, shape[-1], cout), dtype=np.float32) * 0.1
        ref = _conv_ref(x, w, 1, 1)
        got = conv3x3_s1_fused(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            out_dtype=jnp.float32,
        )
        errs.append(rel_mae(got, ref))
    return max(errs)


@check("conv3x3_s2_fused bf16 56x56x128->128", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas.conv import conv3x3_s2_fused

    r = _rng()
    x = r.standard_normal((4, 56, 56, 128), dtype=np.float32)
    w = r.standard_normal((3, 3, 128, 128), dtype=np.float32) * 0.1
    ref = _conv_ref(x, w, 2, 1)
    got = conv3x3_s2_fused(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
        out_dtype=jnp.float32,
    )
    return rel_mae(got, ref)


# ---------------------------------------------------------------------------
# Pools + elementwise
# ---------------------------------------------------------------------------


@check("max_pool2d 3/2/1 on 112x112 (stem pool)", FP32_GATE)
def _():
    from resnetc_tpu.ops import lax_ops
    from resnetc_tpu.ops.pallas.pool import max_pool2d

    r = _rng()
    x = jnp.asarray(r.standard_normal((4, 112, 112, 64), dtype=np.float32))
    ref = lax_ops.max_pool2d(x, kernel_size=3, stride=2, padding=1)
    return rel_mae(max_pool2d(x, kernel_size=3, stride=2, padding=1), np.asarray(ref))


@check("avg_pool2d 7x7 global (head pool)", FP32_GATE)
def _():
    from resnetc_tpu.ops import lax_ops
    from resnetc_tpu.ops.pallas.pool import avg_pool2d

    r = _rng()
    x = jnp.asarray(r.standard_normal((4, 7, 7, 2048), dtype=np.float32))
    ref = lax_ops.avg_pool2d(x, kernel_size=7, stride=1, padding=0)
    return rel_mae(avg_pool2d(x, kernel_size=7, stride=1), np.asarray(ref))


@check("elementwise relu/add/add_relu", FP32_GATE)
def _():
    from resnetc_tpu.ops.pallas import elementwise as ew

    r = _rng()
    a = jnp.asarray(r.standard_normal((17, 1000), dtype=np.float32))
    b = jnp.asarray(r.standard_normal((17, 1000), dtype=np.float32))
    errs = [
        rel_mae(ew.relu(a), np.maximum(np.asarray(a), 0)),
        rel_mae(ew.add(a, b), np.asarray(a) + np.asarray(b)),
        rel_mae(ew.add_relu(a, b), np.maximum(np.asarray(a) + np.asarray(b), 0)),
    ]
    return max(errs)


# ---------------------------------------------------------------------------
# Int8 + megakernel
# ---------------------------------------------------------------------------


@check("int8_matmul vs dequant oracle", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas.quant import (
        int8_matmul,
        quantize_per_channel,
        quantize_per_tensor,
    )

    r = _rng()
    x = jnp.asarray(r.standard_normal((200, 256), dtype=np.float32))
    w = jnp.asarray(r.standard_normal((256, 130), dtype=np.float32) * 0.05)
    xq, sx = quantize_per_tensor(x)
    wq, sw = quantize_per_channel(w)
    ref = (
        np.asarray(xq, np.float32) @ np.asarray(wq, np.float32)
    ) * float(sx) * np.asarray(sw, np.float32)[None, :]
    got = int8_matmul(xq, wq, sx, sw, out_dtype=jnp.float32)
    return rel_mae(got, ref)


@check("bottleneck_block_fused (megakernel) 28x28 c=128", BF16_GATE)
def _():
    from resnetc_tpu.ops import lax_ops
    from resnetc_tpu.ops.pallas.block import bottleneck_block_fused

    r = _rng()
    c, c4 = 128, 512
    x = r.standard_normal((2, 28, 28, c4), dtype=np.float32)
    w1 = r.standard_normal((c4, c), dtype=np.float32) * 0.05
    w2 = r.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05
    w3 = r.standard_normal((c, c4), dtype=np.float32) * 0.05
    b1 = r.standard_normal(c, dtype=np.float32) * 0.1
    b2 = r.standard_normal(c, dtype=np.float32) * 0.1
    b3 = r.standard_normal(c4, dtype=np.float32) * 0.1

    xj = jnp.asarray(x, jnp.float32)
    y = lax_ops.conv2d(xj, jnp.asarray(w1).reshape(1, 1, c4, c)) + b1
    y = jnp.maximum(y, 0)
    y = lax_ops.conv2d(y, jnp.asarray(w2), stride=1, padding=1) + b2
    y = jnp.maximum(y, 0)
    y = lax_ops.conv2d(y, jnp.asarray(w3).reshape(1, 1, c, c4)) + b3
    ref = np.asarray(jnp.maximum(y + xj, 0))

    got = bottleneck_block_fused(
        jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(w1, jnp.bfloat16), jnp.asarray(b1, jnp.float32),
        jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2, jnp.float32),
        jnp.asarray(w3, jnp.bfloat16), jnp.asarray(b3, jnp.float32),
    )
    return rel_mae(got, ref)


@check("bottleneck_block_chained 3-chain 28x28 c=128", BF16_GATE)
def _():
    from resnetc_tpu.ops import lax_ops
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained,
        pad_for_chain,
        unpad_from_chain,
    )

    r = _rng()
    c, c4 = 128, 512
    x = r.standard_normal((2, 28, 28, c4), dtype=np.float32)
    w1 = r.standard_normal((c4, c), dtype=np.float32) * 0.05
    w2 = r.standard_normal((3, 3, c, c), dtype=np.float32) * 0.05
    w3 = r.standard_normal((c, c4), dtype=np.float32) * 0.05
    b1 = r.standard_normal(c, dtype=np.float32) * 0.1
    b2 = r.standard_normal(c, dtype=np.float32) * 0.1
    b3 = r.standard_normal(c4, dtype=np.float32) * 0.1

    ref = jnp.asarray(x, jnp.float32)
    for _ in range(3):
        y = jnp.maximum(lax_ops.conv2d(ref, jnp.asarray(w1).reshape(1, 1, c4, c)) + b1, 0)
        y = jnp.maximum(lax_ops.conv2d(y, jnp.asarray(w2), stride=1, padding=1) + b2, 0)
        ref = jnp.maximum(lax_ops.conv2d(y, jnp.asarray(w3).reshape(1, 1, c, c4)) + b3 + ref, 0)

    yr = pad_for_chain(jnp.asarray(x, jnp.bfloat16))
    for _ in range(3):
        yr = bottleneck_block_chained(
            yr,
            jnp.asarray(w1, jnp.bfloat16), jnp.asarray(b1, jnp.float32),
            jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2, jnp.float32),
            jnp.asarray(w3, jnp.bfloat16), jnp.asarray(b3, jnp.float32),
            h=28, w_sp=28,
        )
    got = unpad_from_chain(yr, 2, 28, 28)
    return rel_mae(got, np.asarray(ref))


# ---------------------------------------------------------------------------
# Whole-model executed-path parity (every serving backend vs the XLA oracle)
# ---------------------------------------------------------------------------


def _model_fixture():
    from resnetc_tpu.models import resnet
    from resnetc_tpu.tensor import BF16

    cfg = resnet.get_config("resnet50")
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    r = _rng()
    x = jnp.asarray(r.standard_normal((8, 224, 224, 3), dtype=np.float32))
    ref = np.asarray(
        jax.jit(lambda f, xx: resnet.forward_folded(cfg, f, xx, policy=BF16))(folded, x),
        np.float32,
    )
    return cfg, variables, folded, x, ref


_FIXTURE = {}


def _fixture():
    if not _FIXTURE:
        _FIXTURE["v"] = _model_fixture()
    return _FIXTURE["v"]


@check("fused_forward (pallas backend) vs XLA logits", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas import fused_forward
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    got = np.asarray(
        jax.jit(lambda f, xx: fused_forward(cfg, f, xx, policy=BF16))(folded, x),
        np.float32,
    )
    assert (got.argmax(-1) == ref.argmax(-1)).all(), "argmax mismatch vs XLA"
    return rel_mae(got, ref)


@check("fused_forward block_fusion (megakernel backend) vs XLA logits", BF16_GATE)
def _():
    from resnetc_tpu.ops.pallas import fused_forward
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    got = np.asarray(
        jax.jit(
            lambda f, xx: fused_forward(cfg, f, xx, policy=BF16, block_fusion=True)
        )(folded, x),
        np.float32,
    )
    assert (got.argmax(-1) == ref.argmax(-1)).all(), "argmax mismatch vs XLA"
    return rel_mae(got, ref)


# int8 e2e gates: tightened from the provisional 0.35 to ~2x the values
# measured on chip 2026-08-19 (int8 1.65e-2, chain 1.55e-2, bake 1.73e-2,
# basic-ds 2.41e-2, basic 1.49e-2 — VERIFY_TPU.json).  rel-MAE here is
# deterministic per seed/config; the 2x headroom absorbs bt-table or
# accumulation-order shifts, not real regressions.
@check("fused_forward_int8 vs XLA logits (argmax only + loose MAE)", 0.04)
def _():
    from resnetc_tpu.ops.pallas.fused import fused_forward_int8
    from resnetc_tpu.ops.pallas.quant import quantize_folded
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    qfolded = quantize_folded(folded)
    got = np.asarray(
        jax.jit(lambda f, xx: fused_forward_int8(cfg, f, xx, policy=BF16))(qfolded, x),
        np.float32,
    )
    match = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert match >= 0.75, f"int8 argmax agreement {match} < 0.75 on random weights"
    return rel_mae(got, ref)


@check("fused_forward_int8_chain vs XLA logits (argmax + loose MAE)", 0.04)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)
    got = np.asarray(
        jax.jit(
            lambda f, s, xx: fused.fused_forward_int8_chain(cfg, f, s, xx, policy=BF16)
        )(qtree, scales, x),
        np.float32,
    )
    match = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert match >= 0.75, f"int8_chain argmax agreement {match} < 0.75"
    return rel_mae(got, ref)


@check("int8_chain whole-stage L1 fusion bit-matches per-block (on chip)", 0.0)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    def run():
        return np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )

    old = fused.STAGE_FUSE_PROJ
    try:
        fused.STAGE_FUSE_PROJ = True
        got = run()
        fused.STAGE_FUSE_PROJ = False
        want = run()
    finally:
        fused.STAGE_FUSE_PROJ = old
    assert (got == want).all(), "whole-stage L1 kernel diverges from per-block"
    return 0.0


@check("int8_chain L1 pixel-paired kernels bit-match per-block (on chip)", 0.0)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    def run():
        return np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )

    old = fused.L1_PIXEL_PAIR
    try:
        fused.L1_PIXEL_PAIR = False
        want = run()
        fused.L1_PIXEL_PAIR = True
        got = run()
    finally:
        fused.L1_PIXEL_PAIR = old
    assert (got == want).all(), "pixel-paired L1 diverges from per-block"
    return 0.0


@check("int8_chain ds pair_dma gather bit-matches the 4-plane gather", 0.0)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    def run():
        return np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )

    old = fused.DS_PAIR_DMA
    try:
        fused.DS_PAIR_DMA = True
        got = run()
        fused.DS_PAIR_DMA = False
        want = run()
    finally:
        fused.DS_PAIR_DMA = old
    assert (got == want).all(), "pair_dma ds kernel diverges from 4-plane"
    return 0.0


# NOTE (2026-08-20): the CHAIN_PIPE_DMA gate check was removed after the
# on-chip pipe_ab run closed the experiment as a measured negative: the
# pipe route is ~4% slower than the auto pipeline where it compiles, and
# the proj form does not compile on real Mosaic at all (manual 64-lane
# HBM memref slice violates the 128-lane tiling constraint; interpret
# mode does not model that check, so the e2e gate could never pass on
# chip).  The route stays in-tree as an interpret-bit-match-tested
# reference (tests/test_pallas.py); gates pin product paths only.


@check("int8_chain ds conv3-onedot bit-matches the per-image loop", 0.0)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    def run():
        return np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )

    old = fused.DS_CONV3_ONEDOT
    try:
        fused.DS_CONV3_ONEDOT = True
        got = run()
        fused.DS_CONV3_ONEDOT = False
        want = run()
    finally:
        fused.DS_CONV3_ONEDOT = old
    assert (got == want).all(), "onedot ds kernel diverges from per-image loop"
    return 0.0


@check("int8_chain per-channel interior bake (opt-in) vs XLA", 0.04)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales_pc = fused.calibrate_chain_scales(
        cfg, folded, x, per_channel_interior=True
    )
    qtree, scales = fused.bake_interior_scales(cfg, folded, scales_pc)
    got = np.asarray(
        jax.jit(
            lambda f, s, xx: fused.fused_forward_int8_chain(
                cfg, f, s, xx, policy=BF16
            )
        )(qtree, scales, x),
        np.float32,
    )
    assert (got.argmax(-1) == ref.argmax(-1)).all(), "argmax mismatch vs XLA"
    return rel_mae(got, ref)


@check("int8_chain hybrid XLA-prefix (stages 0-1 bf16) vs XLA logits", 0.04)
def _():
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    cfg, _, folded, x, ref = _fixture()
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    def run():
        return np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )

    old = fused.HYBRID_XLA_STAGES
    worst = 0.0
    try:
        for stages in [(0,), (0, 1)]:
            fused.HYBRID_XLA_STAGES = stages
            got = run()
            assert (got.argmax(-1) == ref.argmax(-1)).all(), (
                f"argmax mismatch vs XLA at stages={stages}"
            )
            worst = max(worst, rel_mae(got, ref))
    finally:
        fused.HYBRID_XLA_STAGES = old
    return worst


@check("int8_chain basic-ds transitions (resnet18) vs XLA logits", 0.05)
def _():
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    rng = _rng()
    cfg = resnet.get_config("resnet18", num_classes=64)
    variables = resnet.init(cfg, jax.random.key(19))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(
        jax.jit(lambda f, xx: resnet.forward_folded(cfg, f, xx))(folded, x),
        np.float32,
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)
    old = fused.BASIC_DS_INT8
    try:
        fused.BASIC_DS_INT8 = True
        got = np.asarray(
            jax.jit(
                lambda f, s, xx: fused.fused_forward_int8_chain(
                    cfg, f, s, xx, policy=BF16
                )
            )(qtree, scales, x),
            np.float32,
        )
    finally:
        fused.BASIC_DS_INT8 = old
    match = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert match >= 0.75, f"basic-ds int8_chain argmax agreement {match} < 0.75"
    return rel_mae(got, ref)


@check("int8_chain basic family (resnet18) vs XLA logits", 0.04)
def _():
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.tensor import BF16

    rng = _rng()
    cfg = resnet.get_config("resnet18", num_classes=64)
    variables = resnet.init(cfg, jax.random.key(18))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(
        jax.jit(lambda f, xx: resnet.forward_folded(cfg, f, xx))(folded, x),
        np.float32,
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)
    got = np.asarray(
        jax.jit(
            lambda f, s, xx: fused.fused_forward_int8_chain(cfg, f, s, xx, policy=BF16)
        )(qtree, scales, x),
        np.float32,
    )
    match = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert match >= 0.75, f"basic int8_chain argmax agreement {match} < 0.75"
    return rel_mae(got, ref)


def main() -> int:
    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(
            f"verify_tpu: needs a real TPU, got platform={platform!r} — "
            "this gate checks the compiled Mosaic path, not interpret mode.",
            file=sys.stderr,
        )
        return 2

    results = []
    ok_all = True
    for name, gate, fn in _CHECKS:
        try:
            err = fn()
            ok = err <= gate
            results.append(
                {"name": name, "rel_mae": round(err, 8), "gate": gate, "ok": ok}
            )
            print(f"{'PASS' if ok else 'FAIL'}  {name}: rel_mae={err:.3e} (gate {gate:g})")
        except Exception as e:
            ok = False
            results.append(
                {"name": name, "error": f"{type(e).__name__}: {e}", "ok": False}
            )
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            traceback.print_exc()
        ok_all &= ok

    artifact = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "pass": ok_all,
        "checks": results,
    }
    OUT.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"{'ALL PASS' if ok_all else 'FAILURES'} -> {OUT}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
