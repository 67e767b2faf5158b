"""Golden tests for the Pallas TPU kernels against their lax oracles.

Runs in interpret mode on CPU (the compiled path is exercised on real
hardware by bench.py and the TPU smoke script); every kernel's semantics are
pinned to resnetc_tpu.ops.lax_ops, which is itself pinned to torch.
This is the assertion-based replacement for the reference's cuda/test.cu
(print-and-eyeball, no assertions, stale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnetc_tpu.models import resnet
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.ops.pallas.conv import conv1x1_fused, conv3x3_s1_fused
from resnetc_tpu.ops.pallas.gemm import matmul
from resnetc_tpu.ops.pallas.pool import max_pool2d
from resnetc_tpu.ops.pallas.fused import fused_forward
from resnetc_tpu.tensor import FP32


@pytest.mark.parametrize(
    "m,k,n", [(256, 128, 128), (100, 64, 72), (49, 2048, 1000), (300, 192, 130)]
)
def test_matmul_matches_oracle(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.05)
    ref = np.asarray(x) @ np.asarray(w)
    got = matmul(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-4)


def test_matmul_fused_epilogue(rng):
    m, k, n = 192, 256, 320
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((n,), dtype=np.float32))
    r = jnp.asarray(rng.standard_normal((m, n), dtype=np.float32))
    ref = np.maximum(np.asarray(x) @ np.asarray(w) + np.asarray(b) + np.asarray(r), 0)
    got = matmul(x, w, b, r, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-4)


def test_matmul_out_dtype_cast(rng):
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((128, 128), dtype=np.float32))
    got = matmul(x, w, out_dtype=jnp.bfloat16, interpret=True)
    assert got.dtype == jnp.bfloat16


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [(2, 8, 8, 16, 32), (4, 7, 7, 64, 128), (1, 14, 14, 32, 64), (3, 9, 9, 24, 40)],
)
def test_conv3x3_s1_fused_matches_oracle(rng, b, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))
    ref = np.maximum(
        np.asarray(lax_ops.conv2d(x, wt, stride=1, padding=1))
        + np.asarray(bias) + np.asarray(res), 0,
    )
    got = conv3x3_s1_fused(x, wt, bias, res, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_conv3x3_no_bias_no_relu(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, 8, 16), dtype=np.float32) * 0.1)
    ref = np.asarray(lax_ops.conv2d(x, wt, stride=1, padding=1))
    got = conv3x3_s1_fused(x, wt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv1x1_fused_matches_oracle(rng, stride):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((1, 1, 16, 32), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((32,), dtype=np.float32))
    ref = np.asarray(lax_ops.conv2d(x, wt, stride=stride, padding=0)) + np.asarray(bias)
    got = conv1x1_fused(x, wt, bias, stride=stride, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k,s,p,hw", [(3, 2, 1, 12), (2, 2, 0, 8), (3, 1, 1, 7), (3, 3, 1, 9)])
def test_max_pool2d_matches_oracle(rng, k, s, p, hw):
    x = jnp.asarray(rng.standard_normal((4, hw, hw, 24), dtype=np.float32))
    ref = np.asarray(lax_ops.max_pool2d(x, kernel_size=k, stride=s, padding=p))
    got = max_pool2d(x, kernel_size=k, stride=s, padding=p, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_fused_forward_matches_folded_forward(rng):
    """Whole-model Pallas path vs the XLA folded path, fp32 interpret mode."""
    cfg = resnet.get_config("resnet18", num_classes=12)
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))

    ref = resnet.forward_folded(cfg, folded, x, policy=FP32)
    got = fused_forward(cfg, folded, x, policy=FP32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)
    assert np.asarray(got).argmax(-1).tolist() == np.asarray(ref).argmax(-1).tolist()


@pytest.mark.parametrize("k,s,p,hw", [(7, 1, 0, 7), (3, 2, 1, 16), (2, 2, 0, 8)])
def test_avg_pool2d_matches_oracle(rng, k, s, p, hw):
    from resnetc_tpu.ops.pallas.pool import avg_pool2d as pallas_avg

    x = jnp.asarray(rng.standard_normal((4, hw, hw, 24), dtype=np.float32))
    ref = np.asarray(lax_ops.avg_pool2d(x, kernel_size=k, stride=s, padding=p))
    got = pallas_avg(x, kernel_size=k, stride=s, padding=p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_elementwise_kernels(rng):
    from resnetc_tpu.ops.pallas import elementwise as ew

    a = jnp.asarray(rng.standard_normal((3, 17, 50), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((3, 17, 50), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(ew.relu(a, interpret=True)), np.maximum(np.asarray(a), 0)
    )
    np.testing.assert_allclose(
        np.asarray(ew.add(a, b, interpret=True)), np.asarray(a) + np.asarray(b), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ew.add_relu(a, b, interpret=True)),
        np.maximum(np.asarray(a) + np.asarray(b), 0), rtol=1e-6,
    )


def test_bottleneck_block_fused_matches_oracle(rng):
    from resnetc_tpu.ops.pallas.block import bottleneck_block_fused

    b, h, c = 2, 9, 16
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, c4), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))
    w3 = jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1)
    b3 = jnp.asarray(rng.standard_normal((c4,), dtype=np.float32))

    z1 = jnp.maximum(lax_ops.conv2d(x, w1.reshape(1, 1, c4, c)) + b1, 0)
    z2 = jnp.maximum(lax_ops.conv2d(z1, w2, stride=1, padding=1) + b2, 0)
    ref = jnp.maximum(lax_ops.conv2d(z2, w3.reshape(1, 1, c, c4)) + b3 + x, 0)
    got = bottleneck_block_fused(x, w1, b1, w2, b2, w3, b3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h", [9, 7])
def test_bottleneck_block_chained_matches_oracle(rng, h):
    """The padded-row chained variant: a 3-block chain (one pad, three
    kernels, one unpad) must equal three oracle blocks — in particular the
    garbage ring rows of intermediate outputs must never leak into the
    interior (the where-mask NaN-kill property).  h=7 exercises the
    shared-pad-column layout (wp == w+1, no right pad)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained,
        pad_for_chain,
        unpad_from_chain,
    )

    b, c = 2, 16
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, c4), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))
    w3 = jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1)
    b3 = jnp.asarray(rng.standard_normal((c4,), dtype=np.float32))

    ref = x
    for _ in range(3):
        z1 = jnp.maximum(lax_ops.conv2d(ref, w1.reshape(1, 1, c4, c)) + b1, 0)
        z2 = jnp.maximum(lax_ops.conv2d(z1, w2, stride=1, padding=1) + b2, 0)
        ref = jnp.maximum(lax_ops.conv2d(z2, w3.reshape(1, 1, c, c4)) + b3 + ref, 0)

    yr = pad_for_chain(x)
    for _ in range(3):
        yr = bottleneck_block_chained(
            yr, w1, b1, w2, b2, w3, b3, h=h, w_sp=h, interpret=True
        )
    got = unpad_from_chain(yr, b, h, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fused_forward_block_fusion_matches(rng):
    """block_fusion=True must be numerically identical (fp32) to the routed path."""
    cfg = resnet.get_config("resnet50", num_classes=7)
    variables = resnet.init(cfg, jax.random.key(2))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    a = fused_forward(cfg, folded, x, policy=FP32, interpret=True)
    b = fused_forward(cfg, folded, x, policy=FP32, block_fusion=True, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "b,h,cin,cout", [(2, 8, 16, 32), (1, 14, 8, 24), (3, 10, 32, 64), (2, 7, 8, 8)]
)
def test_conv3x3_s2_fused_matches_oracle(rng, b, h, cin, cout):
    from resnetc_tpu.ops.pallas.conv import conv3x3_s2_fused

    x = jnp.asarray(rng.standard_normal((b, h, h, cin), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
    ref = np.maximum(
        np.asarray(lax_ops.conv2d(x, wt, stride=2, padding=1)) + np.asarray(bias), 0
    )
    got = conv3x3_s2_fused(x, wt, bias, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [5, 7])
def test_conv_s2_fused_generic_odd_k(rng, k):
    from resnetc_tpu.ops.pallas.conv import conv_s2_fused

    x = jnp.asarray(rng.standard_normal((2, 18, 18, 8), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((k, k, 8, 16), dtype=np.float32) * 0.1)
    ref = np.asarray(lax_ops.conv2d(x, wt, stride=2, padding=k // 2))
    got = conv_s2_fused(x, wt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Int8 chained megakernel (producer-epilogue quantization).
# ---------------------------------------------------------------------------


def _quant_block_reference(x, q, scales):
    """jnp reference of _chained_kernel_int8's exact math (incl. the
    multiply-by-reciprocal rounding), written op-by-op over NHWC."""
    s_x, s_z1, s_z2, s_y = scales
    b, h, w, c4 = x.shape
    c = q["w1q"].shape[-1]

    def quant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127.0, 127.0)

    xq = quant(x.astype(jnp.float32), s_x)
    z1 = jnp.einsum("bhwi,io->bhwo", xq, q["w1q"].astype(jnp.float32))
    z1 = jnp.maximum(z1 * q["sw1"] * s_x + q["b1"], 0.0)
    z1q = quant(z1, s_z1)

    z1p = jnp.pad(z1q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2p = q["w2pq"].astype(jnp.float32).reshape(3, c, 3, c)  # (kw,k),(kh,j)
    sw2 = q["sw2p"].reshape(3, c)  # row kh
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for kh in range(3):
        ph = jnp.zeros((b, h, w, c), jnp.float32)
        for kw in range(3):
            tap = z1p[:, kh : kh + h, kw : kw + w, :]
            ph = ph + jnp.einsum("bhwk,ko->bhwo", tap, w2p[kw, :, kh, :])
        acc = acc + ph * sw2[kh]
    z2 = jnp.maximum(acc * s_z1 + q["b2"], 0.0)
    z2q = quant(z2, s_z2)

    y = jnp.einsum("bhwk,ko->bhwo", z2q, q["w3q"].astype(jnp.float32))
    y = y * q["sw3"] * s_z2 + q["b3"] + xq * s_x
    return jnp.maximum(y, 0.0)


@pytest.mark.parametrize("h,c", [(9, 16), (7, 16), (9, 64)])
def test_chained_int8_matches_quant_reference(rng, h, c):
    """Kernel (interpret) == the independently-written quantized math, to
    within one output LSB (reciprocal rounding can differ at .5 boundaries).
    h=7 exercises the shared-pad-column layout; c=64 the production L1
    shape's slot-padded kw lane packing."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        pad_for_chain,
        quantize_chain_block,
        unpad_from_chain,
    )

    b = 2
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, c4), dtype=np.float32))
    blk = {
        "conv1": {
            "weight": jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv2": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv3": {
            "weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
        },
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([4.0 / 127, 3.0 / 127, 5.0 / 127, 1.0], jnp.float32)

    ref = _quant_block_reference(x, q, scales)
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    xr = pad_for_chain(quantize_with_scale(x, scales[0]))
    yr = bottleneck_block_chained_int8(
        xr,
        q["w1q"], q["sw1"], q["b1"],
        q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"],
        scales,
        h=h, w_sp=h, emit_i8=False, interpret=True,
    )
    got = unpad_from_chain(yr, b, h, h)
    # bf16 output quantizes the fp32 epilogue value: compare at bf16 grain.
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_chained_int8_conv2_chunked_bitmatch(rng):
    """conv2_chunked recomputes each chunk's P window instead of holding the
    whole int32 stack; per-row arithmetic is identical, so outputs must be
    bit-identical (identity and projection forms)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        chain_meta,
        quantize_chain_block,
        quantize_ds_block,
    )

    # h=24 makes rows-per-step 1352 > the 1024 chunk cap, so the chunked
    # path really splits (two chunks) instead of degenerating to one.
    h, cin, c = 24, 64, 16
    hp, wp = chain_meta(0, h, h)
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    kw = dict(h=h, w_sp=h, emit_i8=True, interpret=True, bt=2)
    base = bottleneck_block_chained_int8(*args, **kw)
    chunked = bottleneck_block_chained_int8(*args, **kw, conv2_chunked=True)
    assert jnp.array_equal(base, chunked)

    qd = quantize_ds_block(
        dict(blk, downsample={"weight": g(cin, 4 * c), "bias": g(4 * c)})
    )
    kwp = dict(kw, wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    base_p = bottleneck_block_chained_int8(*args, **kwp)
    chunked_p = bottleneck_block_chained_int8(*args, **kwp, conv2_chunked=True)
    assert jnp.array_equal(base_p, chunked_p)


def test_chained_int8_emit_mean_matches_rows_mean(rng):
    """emit_mean (the head fold) must equal the global-average pool of the
    bf16-exit rows: per-image mean over the h*w interior, f32.  bt=2
    exercises the per-grid-step (bt, c4) accumulation; identity and
    projection forms both run."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        chain_meta,
        quantize_chain_block,
        quantize_ds_block,
        unpad_from_chain,
    )

    h, cin, c = 8, 64, 16
    hp, wp = chain_meta(0, h, h)
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([0.03, 0.02, 0.03, 1.0], jnp.float32)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    kw = dict(h=h, w_sp=h, emit_i8=False, interpret=True, bt=2)

    rows = bottleneck_block_chained_int8(*args, **kw)
    want = jnp.mean(
        unpad_from_chain(rows, b, h, h).astype(jnp.float32), axis=(1, 2)
    )
    feats = bottleneck_block_chained_int8(*args, **kw, emit_mean=True)
    assert feats.shape == (b, 4 * c) and feats.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(want), rtol=2e-2, atol=2e-2
    )

    qd = quantize_ds_block(
        dict(blk, downsample={"weight": g(cin, 4 * c), "bias": g(4 * c)})
    )
    kwp = dict(kw, wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    rows_p = bottleneck_block_chained_int8(*args, **kwp)
    want_p = jnp.mean(
        unpad_from_chain(rows_p, b, h, h).astype(jnp.float32), axis=(1, 2)
    )
    feats_p = bottleneck_block_chained_int8(*args, **kwp, emit_mean=True)
    np.testing.assert_allclose(
        np.asarray(feats_p), np.asarray(want_p), rtol=2e-2, atol=2e-2
    )


def test_chained_int8_manual_dma_bitmatch(rng):
    """The manual-DMA (double-buffered row-stream) variant must be
    bit-identical to the auto-pipelined kernel: same compute body, only the
    x delivery differs.  bt=2 exercises the ping-pong across grid steps;
    both identity and projection forms run."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        chain_meta,
        quantize_chain_block,
        quantize_ds_block,
    )

    h, cin, c = 8, 64, 16
    hp, wp = chain_meta(0, h, h)
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    xr = jnp.asarray(
        rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8
    )
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    kw = dict(h=h, w_sp=h, emit_i8=True, interpret=True, bt=2)
    auto = bottleneck_block_chained_int8(*args, **kw)
    manual = bottleneck_block_chained_int8(*args, **kw, manual_dma=True)
    assert jnp.array_equal(auto, manual)

    qd = quantize_ds_block(
        dict(blk, downsample={"weight": g(cin, 4 * c), "bias": g(4 * c)})
    )
    kwp = dict(kw, wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    auto_p = bottleneck_block_chained_int8(*args, **kwp)
    manual_p = bottleneck_block_chained_int8(*args, **kwp, manual_dma=True)
    assert jnp.array_equal(auto_p, manual_p)


def test_chained_int8_pipe_dma_bitmatch(rng):
    """The fully-manual pipe variant (BOTH the input and output row streams
    as in-kernel double-buffered DMAs) must be bit-identical to the
    auto-pipelined kernel: same compute body, only the delivery of x and
    the flush of o differ.  Covers the ping-pong (n=2 and n=4 grid steps),
    the single-step edge (n=1), the bf16 exit, and the projection form."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        chain_meta,
        quantize_chain_block,
        quantize_ds_block,
    )

    h, cin, c = 8, 64, 16
    hp, wp = chain_meta(0, h, h)
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    xr = jnp.asarray(
        rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8
    )
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    for bt in (1, 2, 4):  # n = 4, 2, 1 grid steps
        kw = dict(h=h, w_sp=h, emit_i8=True, interpret=True, bt=bt)
        auto = bottleneck_block_chained_int8(*args, **kw)
        pipe = bottleneck_block_chained_int8(*args, **kw, pipe_dma=True)
        assert jnp.array_equal(auto, pipe), f"bt={bt}"

    # bf16 exit (emit_i8=False): obuf/ostream in bf16.
    kw16 = dict(h=h, w_sp=h, emit_i8=False, interpret=True, bt=2)
    auto16 = bottleneck_block_chained_int8(*args, **kw16)
    pipe16 = bottleneck_block_chained_int8(*args, **kw16, pipe_dma=True)
    assert jnp.array_equal(auto16, pipe16)

    # Projection form (layer1 block 0).
    qd = quantize_ds_block(
        dict(blk, downsample={"weight": g(cin, 4 * c), "bias": g(4 * c)})
    )
    kwp = dict(h=h, w_sp=h, emit_i8=True, interpret=True, bt=2,
               wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    auto_p = bottleneck_block_chained_int8(*args, **kwp)
    pipe_p = bottleneck_block_chained_int8(*args, **kwp, pipe_dma=True)
    assert jnp.array_equal(auto_p, pipe_p)


def test_chained_int8_emit_i8_roundtrip(rng):
    """emit_i8=True output dequantized with s_y equals the bf16-emitting
    variant to within one LSB of s_y (the producer-epilogue contract)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        pad_for_chain,
        quantize_chain_block,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, h, c = 1, 8, 8
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, c4), dtype=np.float32))
    blk = {
        "conv1": {
            "weight": jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.1),
            "bias": jnp.zeros((c,), jnp.float32),
        },
        "conv2": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.zeros((c,), jnp.float32),
        },
        "conv3": {
            "weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1),
            "bias": jnp.zeros((c4,), jnp.float32),
        },
    }
    q = quantize_chain_block(blk)
    s_y = jnp.float32(6.0 / 127)
    scales = jnp.asarray([4.0 / 127, 3.0 / 127, 5.0 / 127, s_y], jnp.float32)
    xr = pad_for_chain(quantize_with_scale(x, scales[0]))

    args = (
        q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    y_i8 = bottleneck_block_chained_int8(
        xr, *args, h=h, w_sp=h, emit_i8=True, interpret=True
    )
    y_bf = bottleneck_block_chained_int8(
        xr, *args, h=h, w_sp=h, emit_i8=False, interpret=True
    )
    assert y_i8.dtype == jnp.int8
    hp, wp = h + 2, 16
    interior = np.asarray(y_bf, np.float32).reshape(b, hp, wp, c4)[:, 1:-1, 1 : 1 + h]
    deq = np.asarray(y_i8, np.float32).reshape(b, hp, wp, c4)[:, 1:-1, 1 : 1 + h] * float(s_y)
    np.testing.assert_allclose(deq, np.clip(interior, 0, 127 * float(s_y)), atol=1.1 * float(s_y))


def test_fused_forward_int8_chain_close_to_fp(rng):
    """End-to-end int8 chained serving stays close to the fp folded path on
    a small random model (the real-weights accuracy gate runs when a
    checkpoint is available; see test_acceptance)."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    # Realistic calibration: scales come from the same distribution the
    # engine later sees (here: the eval batch itself).
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))

    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True), np.float32
    )
    rel_mae = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel_mae < 0.05, rel_mae
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_int8_chain_run_fuse_vmem_fallback(rng, monkeypatch):
    """When the run kernel's bt picker reports a VMEM no-fit (returns 0),
    fused_forward_int8_chain must degrade to per-block kernels — same
    logits — instead of tripping the run kernel's fit assert."""
    from resnetc_tpu.ops.pallas import block as block_mod
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )

    monkeypatch.setattr(fused_mod, "RUN_FUSE_STAGES", (0, 1, 2, 3))
    monkeypatch.setattr(
        block_mod, "_pick_bt_run_int8", lambda *a, **k: 0
    )
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int8_chain_per_stage_error_decomposition(rng):
    """Int8 error must accumulate gradually: every stage boundary of the
    chain pipeline stays within a per-stage rel-MAE budget of the fp folded
    path, so a quantization regression is localised to its first bad stage
    (the int8 analogue of verify.stage_parity_report)."""
    from resnetc_tpu.models.resnet import _folded_conv
    from resnetc_tpu.ops import lax_ops
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )
    from resnetc_tpu.tensor import FP32

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(5))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))

    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    taps: list = []
    fused_forward_int8_chain(
        cfg, qtree, scales, x, interpret=True, stage_taps=taps, policy=FP32
    )
    assert len(taps) == 4

    # fp reference taps at the same stage boundaries (fp32 folded math).
    y = _folded_conv(x, folded["conv1"], stride=2, padding=3, act=True, policy=FP32)
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)
    budgets = (0.04, 0.05, 0.06, 0.08)  # error growth headroom per stage
    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            stride = 2 if (stage > 0 and b == 0) else 1
            z = _folded_conv(y, blk["conv1"], stride=1, padding=0, act=True, policy=FP32)
            z = _folded_conv(z, blk["conv2"], stride=stride, padding=1, act=True, policy=FP32)
            z = _folded_conv(z, blk["conv3"], stride=1, padding=0, act=False, policy=FP32)
            sc = (
                _folded_conv(y, blk["downsample"], stride=stride, padding=0,
                             act=False, policy=FP32)
                if "downsample" in blk else y
            )
            y = lax_ops.relu(z + sc)
        ref = np.asarray(y, np.float32)
        got = np.asarray(taps[stage], np.float32)
        rel = np.mean(np.abs(got - ref)) / (np.mean(np.abs(ref)) + 1e-12)
        assert rel < budgets[stage], (stage, rel)


def test_downsample_block_s2_int8_matches_quant_reference(rng):
    """The stride-2 phase-plane downsample megakernel == the quantized math
    written op-by-op (conv1 full-res, 3x3/2, conv3 + projection shortcut)."""
    from resnetc_tpu.ops.pallas.block import (
        downsample_block_s2_int8,
        pad_for_chain,
        quantize_ds_block,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, h, cin, c = 2, 10, 32, 16
    c4 = 4 * c
    oh = h // 2
    x = jnp.asarray(rng.standard_normal((b, h, h, cin), dtype=np.float32))
    blk = {
        "conv1": {
            "weight": jnp.asarray(rng.standard_normal((cin, c), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv2": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv3": {
            "weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
        },
        "downsample": {
            "weight": jnp.asarray(rng.standard_normal((cin, c4), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
        },
    }
    q = quantize_ds_block(blk)
    s_x, s_z1, s_z2 = 4.0 / 127, 3.0 / 127, 5.0 / 127
    scales = jnp.asarray([s_x, s_z1, s_z2, 1.0], jnp.float32)

    def quant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127.0, 127.0)

    xq = quant(x, s_x)
    z1 = jnp.einsum("bhwi,io->bhwo", xq, q["w1q"].astype(jnp.float32))
    z1 = jnp.maximum(z1 * q["sw1"] * s_x + q["b1"], 0.0)
    z1q = quant(z1, s_z1)
    acc = lax_ops.conv2d(z1q, q["w2q"].astype(jnp.float32), stride=2, padding=1)
    z2 = jnp.maximum(acc * q["sw2"] * s_z1 + q["b2"], 0.0)
    z2q = quant(z2, s_z2)
    y = jnp.einsum("bhwk,ko->bhwo", z2q, q["w3q"].astype(jnp.float32))
    y = y * q["sw3"] * s_z2 + q["b3"]
    sc = jnp.einsum("bhwi,io->bhwo", xq[:, ::2, ::2, :], q["wdq"].astype(jnp.float32))
    y = y + sc * q["swd"] * s_x + q["bd"]
    ref = jnp.maximum(y, 0.0)

    yr = downsample_block_s2_int8(
        pad_for_chain(quantize_with_scale(x, jnp.float32(s_x))),
        q["w1q"], q["sw1"], q["b1"],
        q["w2q"], q["sw2"], q["b2"],
        q["w3q"], q["sw3"], q["b3"],
        q["wdq"], q["swd"], q["bd"],
        scales,
        h=h, w_sp=h, emit_i8=False, interpret=True,
    )
    got = unpad_from_chain(yr, b, oh, oh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("h", [56, 16])
def test_downsample_pair_dma_bitmatch(rng, h):
    """pair_dma=True (two coarse ph-pair DMAs + 128-aligned in-kernel pw
    splits) must bit-match the production 4-plane gather on both the direct
    (h=56) and generic (h=16) geometries — same dots, same epilogue order."""
    from resnetc_tpu.ops.pallas.block import (
        chain_meta,
        downsample_block_s2_int8,
        quantize_ds_block,
    )

    b, cin, c = 2, 256, 128
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    q = quantize_ds_block({
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
        "downsample": {"weight": g(cin, c4), "bias": g(c4)},
    })
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(
        rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8
    )
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2q"], q["sw2"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], q["wdq"], q["swd"], q["bd"], scales,
    )
    kw = dict(h=h, w_sp=h, emit_i8=True, interpret=True)
    base = downsample_block_s2_int8(*args, pair_dma=False, **kw)
    pair = downsample_block_s2_int8(*args, pair_dma=True, **kw)
    assert jnp.array_equal(base, pair), "pair_dma output diverged"
    # onedot (whole-block conv3 + shortcut dots, one epilogue, per-image
    # stores) keeps the exact fp32 op order — must bit-match too, alone and
    # composed with pair_dma.
    one = downsample_block_s2_int8(*args, pair_dma=False, onedot=True, **kw)
    assert jnp.array_equal(base, one), "onedot output diverged"
    both = downsample_block_s2_int8(*args, pair_dma=True, onedot=True, **kw)
    assert jnp.array_equal(base, both), "onedot+pair_dma output diverged"
    # bf16-exit (emit_i8=False) branch of onedot must bit-match too.  The
    # unwritten chain-ring rows of a bf16 output buffer are NaN in
    # interpret mode (NaN != NaN breaks plain array_equal on BOTH sides),
    # so compare with equal_nan — written rows are finite.
    kw_bf = dict(kw, emit_i8=False)
    base_bf = downsample_block_s2_int8(*args, **kw_bf)
    one_bf = downsample_block_s2_int8(*args, onedot=True, **kw_bf)
    assert jnp.array_equal(
        base_bf, one_bf, equal_nan=True
    ), "onedot bf16-exit diverged"


@pytest.mark.parametrize("h", [56, 16])
def test_downsample_pipe_out_bitmatch(rng, h):
    """pipe_out=True (manual double-buffered OUTPUT stream; the input side
    is already a manual plane gather) must match the auto out window on the
    written rows, with the never-written chain-ring rows pinned to the
    zero-fill contract.  Runs on direct (h=56) and generic (h=16)
    geometries, alone and composed with onedot."""
    from resnetc_tpu.ops.pallas.block import (
        chain_meta,
        downsample_block_s2_int8,
        quantize_ds_block,
    )

    b, cin, c = 2, 256, 128
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    q = quantize_ds_block({
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
        "downsample": {"weight": g(cin, c4), "bias": g(c4)},
    })
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(
        rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8
    )
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2q"], q["sw2"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], q["wdq"], q["swd"], q["bd"], scales,
    )
    oh = (h + 1) // 2
    hp2, wp2 = chain_meta(0, oh, oh)
    # Written rows per image: [wp2 + 1, wp2 + 1 + n_u) (see the kernel's
    # per-image store mapping).
    n_u = hp2 // 2 * (wp2 // 2) * 4 // 4  # placeholder, recomputed below
    hq, wq = (hp // 2, wp // 2) if (hp % 2 == 0 and wp % 2 == 0 and wp // 2 == wp2) else (hp2, wp2)
    n_u = hq * wq - wq - 1
    written = np.zeros((b * hp2 * wp2,), bool)
    for k in range(b):
        lo = k * hp2 * wp2 + wp2 + 1
        written[lo : lo + n_u] = True

    kw = dict(h=h, w_sp=h, emit_i8=True, interpret=True)
    for extra in ({}, {"onedot": True}):
        base = downsample_block_s2_int8(*args, **kw, **extra)
        pipe = downsample_block_s2_int8(*args, **kw, **extra, pipe_out=True)
        nb, npi = np.asarray(base), np.asarray(pipe)
        assert np.array_equal(nb[written], npi[written]), f"interior {extra}"
        assert not npi[~written].any(), "pipe_out ring rows must be zero"


def test_chained_int8_projection_shortcut(rng):
    """wdq/swd/bd turn the identity residual into the stride-1 projection
    block (layer1 block 0): kernel == quantized reference with cin != 4c."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        pad_for_chain,
        quantize_chain_block,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_per_channel, quantize_with_scale

    b, h, cin, c = 2, 8, 24, 16
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, cin), dtype=np.float32))
    blk = {
        "conv1": {
            "weight": jnp.asarray(rng.standard_normal((cin, c), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv2": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv3": {
            "weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1),
            "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
        },
    }
    q = quantize_chain_block(blk)
    wd = jnp.asarray(rng.standard_normal((cin, c4), dtype=np.float32) * 0.1)
    bd = jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1)
    wdq, swd = quantize_per_channel(wd)
    s_x, s_z1, s_z2 = 4.0 / 127, 3.0 / 127, 5.0 / 127
    scales = jnp.asarray([s_x, s_z1, s_z2, 1.0], jnp.float32)

    def quant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127.0, 127.0)

    xq = quant(x, s_x)
    z1 = jnp.einsum("bhwi,io->bhwo", xq, q["w1q"].astype(jnp.float32))
    z1 = jnp.maximum(z1 * q["sw1"] * s_x + q["b1"], 0.0)
    z1q = quant(z1, s_z1)
    z1p = jnp.pad(z1q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2p = q["w2pq"].astype(jnp.float32).reshape(3, 16, 3, 16)
    sw2 = q["sw2p"].reshape(3, 16)
    accs = jnp.zeros((b, h, h, 16), jnp.float32)
    for kh in range(3):
        ph = jnp.zeros((b, h, h, 16), jnp.float32)
        for kw in range(3):
            tap = z1p[:, kh : kh + h, kw : kw + h, :]
            ph = ph + jnp.einsum("bhwk,ko->bhwo", tap, w2p[kw, :, kh, :])
        accs = accs + ph * sw2[kh]
    z2 = jnp.maximum(accs * s_z1 + q["b2"], 0.0)
    z2q = quant(z2, s_z2)
    y = jnp.einsum("bhwk,ko->bhwo", z2q, q["w3q"].astype(jnp.float32))
    y = y * q["sw3"] * s_z2 + q["b3"]
    sc = jnp.einsum("bhwi,io->bhwo", xq, wdq.astype(jnp.float32))
    ref = jnp.maximum(y + sc * swd * s_x + bd, 0.0)

    xr = pad_for_chain(quantize_with_scale(x, jnp.float32(s_x)))
    yr = bottleneck_block_chained_int8(
        xr,
        q["w1q"], q["sw1"], q["b1"],
        q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"],
        scales,
        h=h, w_sp=h, emit_i8=False, interpret=True,
        wdq=wdq, swd=swd, bd=bd,
    )
    got = unpad_from_chain(yr, b, h, h)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_run_chained_int8_matches_sequential_blocks(rng):
    """The stage-run megakernel (N blocks, one kernel, VMEM ping-pong) ==
    the same N blocks through bottleneck_block_chained_int8 sequentially."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        bottleneck_run_chained_int8,
        pad_for_chain,
        quantize_chain_block,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, h, c = 2, 8, 16
    c4 = 4 * c
    x = jnp.asarray(rng.standard_normal((b, h, h, c4), dtype=np.float32))
    qs = []
    for _ in range(2):
        blk = {
            "conv1": {
                "weight": jnp.asarray(rng.standard_normal((c4, c), dtype=np.float32) * 0.1),
                "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
            },
            "conv2": {
                "weight": jnp.asarray(rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1),
                "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
            },
            "conv3": {
                "weight": jnp.asarray(rng.standard_normal((c, c4), dtype=np.float32) * 0.1),
                "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
            },
        }
        qs.append(quantize_chain_block(blk))

    s = [4.0 / 127, 3.0 / 127, 5.0 / 127, 4.5 / 127]
    scales0 = jnp.asarray([s[0], s[1], s[2], s[3]], jnp.float32)
    scales1 = jnp.asarray([s[3], s[1], s[2], 1.0], jnp.float32)
    xr = pad_for_chain(quantize_with_scale(x, jnp.float32(s[0])))

    def one(q, xq, sc, emit):
        return bottleneck_block_chained_int8(
            xq,
            q["w1q"], q["sw1"], q["b1"],
            q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"],
            sc, h=h, w_sp=h, emit_i8=emit, interpret=True,
        )

    ref = one(qs[1], one(qs[0], xr, scales0, True), scales1, False)

    stk = lambda key: jnp.stack([q[key] for q in qs])
    got = bottleneck_run_chained_int8(
        xr,
        stk("w1q"), stk("sw1"), stk("b1"),
        stk("w2pq"), stk("sw2p"), stk("b2"),
        stk("w3q"), stk("sw3"), stk("b3"),
        jnp.stack([scales0, scales1]),
        h=h, w_sp=h, emit_i8=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_run_chained_int8_pipe_dma_bitmatch(rng):
    """The run kernel's pipe-DMA route (manual in+out row streams) must be
    bit-identical to the auto-pipelined run kernel, across grid-step counts
    (n=2 ping-pong, n=1 edge) and for the bf16 exit."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_run_chained_int8,
        chain_meta,
        quantize_chain_block,
    )

    b, h, c = 4, 8, 16
    c4 = 4 * c
    hp, wp = chain_meta(0, h, h)
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    qs = [
        quantize_chain_block({
            "conv1": {"weight": g(c4, c), "bias": g(c)},
            "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
            "conv3": {"weight": g(c, c4), "bias": g(c4)},
        })
        for _ in range(2)
    ]
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, c4)), jnp.int8)
    scales = jnp.stack([
        jnp.asarray([0.03, 0.02, 0.03, 0.025], jnp.float32),
        jnp.asarray([0.025, 0.02, 0.03, 0.02], jnp.float32),
    ])
    stk = lambda key: jnp.stack([q[key] for q in qs])
    args = (
        xr,
        stk("w1q"), stk("sw1"), stk("b1"),
        stk("w2pq"), stk("sw2p"), stk("b2"),
        stk("w3q"), stk("sw3"), stk("b3"),
        scales,
    )
    for bt, emit in ((2, True), (4, True), (2, False)):
        kw = dict(h=h, w_sp=h, emit_i8=emit, interpret=True, bt=bt)
        auto = bottleneck_run_chained_int8(*args, **kw)
        pipe = bottleneck_run_chained_int8(*args, **kw, pipe_dma=True)
        assert jnp.array_equal(auto, pipe), (bt, emit)


@pytest.mark.parametrize("bt", [None, 1])
def test_run_chained_int8_whole_stage_with_projection(rng, bt):
    """The whole-stage form of the run kernel (projection block 0 + N-1
    identity blocks, ONE kernel, cin != 4c) == the same blocks through
    bottleneck_block_chained_int8 sequentially.  bt=1 forces multiple grid
    steps (the picker takes bt=b at test shapes, leaving the multi-step
    BlockSpec path untested otherwise)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        bottleneck_run_chained_int8,
        pad_for_chain,
        quantize_chain_block,
    )
    from resnetc_tpu.ops.pallas.quant import (
        quantize_per_channel,
        quantize_with_scale,
    )

    b, h, cin, c = 2, 8, 24, 16
    c4 = 4 * c

    def mk_blk(cin_n):
        return {
            "conv1": {
                "weight": jnp.asarray(
                    rng.standard_normal((cin_n, c), dtype=np.float32) * 0.1
                ),
                "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
            },
            "conv2": {
                "weight": jnp.asarray(
                    rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
                ),
                "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
            },
            "conv3": {
                "weight": jnp.asarray(
                    rng.standard_normal((c, c4), dtype=np.float32) * 0.1
                ),
                "bias": jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1),
            },
        }

    q0 = quantize_chain_block(mk_blk(cin))
    q1 = quantize_chain_block(mk_blk(c4))
    wd = jnp.asarray(rng.standard_normal((cin, c4), dtype=np.float32) * 0.1)
    bd = jnp.asarray(rng.standard_normal((c4,), dtype=np.float32) * 0.1)
    wdq, swd = quantize_per_channel(wd)

    s = [4.0 / 127, 3.0 / 127, 5.0 / 127, 4.5 / 127]
    scales0 = jnp.asarray([s[0], s[1], s[2], s[3]], jnp.float32)
    scales1 = jnp.asarray([s[3], s[1], s[2], 1.0], jnp.float32)

    x = jnp.asarray(rng.standard_normal((b, h, h, cin), dtype=np.float32))
    xr = pad_for_chain(quantize_with_scale(x, jnp.float32(s[0])))

    y0 = bottleneck_block_chained_int8(
        xr,
        q0["w1q"], q0["sw1"], q0["b1"],
        q0["w2pq"], q0["sw2p"], q0["b2"],
        q0["w3q"], q0["sw3"], q0["b3"],
        scales0, h=h, w_sp=h, emit_i8=True, interpret=True,
        wdq=wdq, swd=swd, bd=bd,
    )
    ref = bottleneck_block_chained_int8(
        y0,
        q1["w1q"], q1["sw1"], q1["b1"],
        q1["w2pq"], q1["sw2p"], q1["b2"],
        q1["w3q"], q1["sw3"], q1["b3"],
        scales1, h=h, w_sp=h, emit_i8=False, interpret=True,
    )

    stk = lambda key, qs: jnp.stack([q[key] for q in qs])
    got = bottleneck_run_chained_int8(
        xr,
        stk("w1q", [q1]), stk("sw1", [q0, q1]), stk("b1", [q0, q1]),
        stk("w2pq", [q0, q1]), stk("sw2p", [q0, q1]), stk("b2", [q0, q1]),
        stk("w3q", [q0, q1]), stk("sw3", [q0, q1]), stk("b3", [q0, q1]),
        jnp.stack([scales0, scales1]),
        h=h, w_sp=h, emit_i8=False, interpret=True, bt=bt,
        w1q0=q0["w1q"], wdq=wdq, swd=swd, bd=bd,
    )
    # Same int8 arithmetic on both paths: the run form must BIT-match.
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_int8_chain_stage_fuse_proj_bitmatch(rng, monkeypatch):
    """STAGE_FUSE_PROJ (whole layer1 = ONE kernel, projection included)
    must (a) actually take the whole-stage branch and (b) produce
    BIT-identical logits to the per-block/identity-run path — both sides
    run the same int8 arithmetic."""
    from resnetc_tpu.ops.pallas import block as block_mod
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(5))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    monkeypatch.setattr(fused_mod, "STAGE_FUSE_PROJ", False)
    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )

    calls = []
    real_run = block_mod.bottleneck_run_chained_int8

    def spy(*args, **kwargs):
        calls.append(kwargs.get("w1q0") is not None)
        return real_run(*args, **kwargs)

    monkeypatch.setattr(fused_mod, "STAGE_FUSE_PROJ", True)
    monkeypatch.setattr(block_mod, "bottleneck_run_chained_int8", spy)
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    assert any(calls), "whole-stage branch never executed"
    np.testing.assert_array_equal(got, want)


def test_int8_chain_ds_conv3_onedot_bitmatch(rng, monkeypatch):
    """DS_CONV3_ONEDOT (ds megakernel conv3+shortcut as whole-block dots)
    must take the onedot path in every ds kernel call and produce
    BIT-identical logits — same dots, same fp32 epilogue order."""
    from resnetc_tpu.ops.pallas import block as block_mod
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(5))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    monkeypatch.setattr(fused_mod, "DS_CONV3_ONEDOT", False)
    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )

    calls = []
    real_ds = block_mod.downsample_block_s2_int8

    def spy(*args, **kwargs):
        calls.append(kwargs.get("onedot"))
        return real_ds(*args, **kwargs)

    monkeypatch.setattr(fused_mod, "DS_CONV3_ONEDOT", True)
    monkeypatch.setattr(block_mod, "downsample_block_s2_int8", spy)
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    assert calls and all(calls), "onedot path never executed"
    np.testing.assert_array_equal(got, want)


def test_basic_block_chained_int8_matches_quant_reference(rng):
    """The basic-block int8 megakernel == an explicit int8 quantized
    reference (same rounding at every stage) on the interior."""
    from resnetc_tpu.ops.pallas.block import (
        basic_block_chained_int8,
        chain_meta,
        pad_for_chain,
        quantize_basic_block,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, h, c = 2, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, h, c), dtype=np.float32))
    blk = {
        "conv1": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
        "conv2": {
            "weight": jnp.asarray(
                rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
            ),
            "bias": jnp.asarray(rng.standard_normal((c,), dtype=np.float32) * 0.1),
        },
    }
    q = quantize_basic_block(blk)
    s_x, s_z1, s_y = 4.0 / 127, 3.0 / 127, 5.0 / 127
    scales = jnp.asarray([s_x, s_z1, s_y], jnp.float32)

    xr = pad_for_chain(quantize_with_scale(x, jnp.float32(s_x)))
    got_r = basic_block_chained_int8(
        xr,
        q["w1pq"], q["sw1p"], q["b1"],
        q["w2pq"], q["sw2p"], q["b2"],
        scales, h=h, w_sp=h, emit_i8=True, interpret=True,
    )
    got = np.asarray(unpad_from_chain(got_r, b, h, h), np.float32) * s_y

    # Quantized reference with identical arithmetic (fp32, same rounding).
    def quant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127.0, 127.0)

    xq = quant(x, s_x)
    # conv1: int dot == fp dot on integer values; emulate with fp32 conv on
    # the quantized operands.  Per-(kh,j) scales mean the conv accumulates
    # over kh with different column scales — run the three kh rows apart.
    w1q = q["w1pq"].astype(jnp.float32).reshape(3, c, 3, c)  # (kw, k, kh, j)
    w1 = jnp.transpose(w1q, (2, 0, 1, 3))  # (kh, kw, k, j)
    p1 = sum(
        lax_ops.conv2d(
            xq.astype(jnp.float32), jnp.where(
                (jnp.arange(3) == kh)[:, None, None, None], w1, 0.0
            ), stride=1, padding=1,
        )
        * q["sw1p"].astype(jnp.float32).reshape(3, c)[kh] * (s_x / s_z1)
        for kh in range(3)
    )
    z1 = jnp.maximum(p1 + blk["conv1"]["bias"] / s_z1, 0.0)
    z1q = jnp.minimum(jnp.round(z1), 127.0)

    w2q = q["w2pq"].astype(jnp.float32).reshape(3, c, 3, c)
    w2 = jnp.transpose(w2q, (2, 0, 1, 3))
    p2 = sum(
        lax_ops.conv2d(
            z1q, jnp.where((jnp.arange(3) == kh)[:, None, None, None], w2, 0.0),
            stride=1, padding=1,
        )
        * q["sw2p"].astype(jnp.float32).reshape(3, c)[kh] * (s_z1 / s_y)
        for kh in range(3)
    )
    y = jnp.maximum(p2 + blk["conv2"]["bias"] / s_y + xq * (s_x / s_y), 0.0)
    ref = np.asarray(jnp.minimum(jnp.round(y), 127.0), np.float32) * s_y

    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


@pytest.mark.parametrize("h,w", [(10, 10), (7, 7), (10, 14)])
def test_basic_ds_block_s2_int8_matches_quant_reference(rng, h, w):
    """The stride-2 basic-ds megakernel (3x3/2 pair-tap dots + kh-batched
    3x3 + 1x1/2 projection, ONE kernel) == an explicit int8 quantized
    reference with identical rounding, on the direct (10x10), generic
    (7x7), and non-square (10x14) geometries."""
    from resnetc_tpu.ops.pallas.block import (
        basic_ds_block_s2_int8,
        pad_for_chain,
        quantize_basic_ds_block,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, cin, c = 2, 16, 32
    oh, ow = (h + 1) // 2, (w + 1) // 2
    x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(3, 3, cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "downsample": {"weight": g(cin, c), "bias": g(c)},
    }
    q = quantize_basic_ds_block(blk)
    s_x, s_z1, s_y = 4.0 / 127, 3.0 / 127, 5.0 / 127
    scales = jnp.asarray([s_x, s_z1, s_y], jnp.float32)

    got_r = basic_ds_block_s2_int8(
        pad_for_chain(quantize_with_scale(x, jnp.float32(s_x))),
        q["w1pq"], q["sw1"], q["b1"],
        q["w2pq"], q["sw2p"], q["b2"],
        q["wdq"], q["swd"], q["bd"],
        scales, h=h, w_sp=w, emit_i8=True, interpret=True,
    )
    # The onedot shortcut form (whole-block dot, one epilogue) must
    # BIT-match the per-image loop on every geometry.
    got_one = basic_ds_block_s2_int8(
        pad_for_chain(quantize_with_scale(x, jnp.float32(s_x))),
        q["w1pq"], q["sw1"], q["b1"],
        q["w2pq"], q["sw2p"], q["b2"],
        q["wdq"], q["swd"], q["bd"],
        scales, h=h, w_sp=w, emit_i8=True, onedot=True, interpret=True,
    )
    assert jnp.array_equal(got_r, got_one), "basic-ds onedot diverged"
    got = np.asarray(unpad_from_chain(got_r, b, oh, ow), np.float32) * s_y

    def quant(v, s):
        return jnp.clip(jnp.round(v * (1.0 / s)), -127.0, 127.0)

    xq = quant(x, s_x)
    # conv1 (3x3 s2): JOINT per-channel scales — one fp conv on the
    # reassembled int8 taps emulates the int32 tap accumulation exactly.
    w1q = jnp.stack(
        [
            jnp.stack([q["w1pq"][u, v * cin : (v + 1) * cin] for v in range(3)])
            for u in range(3)
        ]
    ).astype(jnp.float32)  # (kh, kw, cin, c); slot order [v0|v1|v2(shift)]
    p1 = lax_ops.conv2d(xq.astype(jnp.float32), w1q, stride=2, padding=1)
    z1 = jnp.maximum(
        p1 * q["sw1"].astype(jnp.float32) * (s_x / s_z1)
        + blk["conv1"]["bias"] / s_z1,
        0.0,
    )
    z1q = jnp.minimum(jnp.round(z1), 127.0)

    # conv2 (3x3 s1): per-(kh, j) scales — kh rows dequantized apart.
    w2q = q["w2pq"].astype(jnp.float32).reshape(3, c, 3, c)
    w2 = jnp.transpose(w2q, (2, 0, 1, 3))
    p2 = sum(
        lax_ops.conv2d(
            z1q, jnp.where((jnp.arange(3) == kh)[:, None, None, None], w2, 0.0),
            stride=1, padding=1,
        )
        * q["sw2p"].astype(jnp.float32).reshape(3, c)[kh] * (s_z1 / s_y)
        for kh in range(3)
    )
    sc = jnp.einsum(
        "bhwi,io->bhwo", xq[:, ::2, ::2, :], q["wdq"].astype(jnp.float32)
    )
    y = jnp.maximum(
        p2 + blk["conv2"]["bias"] / s_y
        + sc * q["swd"].astype(jnp.float32) * (s_x / s_y)
        + blk["downsample"]["bias"] / s_y,
        0.0,
    )
    ref = np.asarray(jnp.minimum(jnp.round(y), 127.0), np.float32) * s_y

    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_stem_cin_pad_exact(rng, monkeypatch):
    """STEM_CIN_PAD zero-pads the stem conv's cin — the logits must be
    unchanged (zero channels contribute zero)."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused as fused_mod

    cfg = resnet.get_config("resnet50", num_classes=9)
    variables = resnet.init(cfg, jax.random.key(7))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = fused_mod.calibrate_chain_scales(cfg, folded, x)
    qtree = fused_mod.quantize_chain(cfg, folded)
    base = np.asarray(
        fused_mod.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    monkeypatch.setattr(fused_mod, "STEM_CIN_PAD", 8)
    padded = np.asarray(
        fused_mod.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(padded, base, rtol=0, atol=1e-3)


def test_int8_chain_basic_ds_branch(rng, monkeypatch):
    """BASIC_DS_INT8=True must (a) actually route every stage transition
    through basic_ds_block_s2_int8 and (b) stay close to the fp reference
    e2e (the transition swaps bf16 XLA math for int8 — bit-equality with
    the flag-off path is not expected)."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import block as block_mod
    from resnetc_tpu.ops.pallas import fused as fused_mod

    cfg = resnet.get_config("resnet18", num_classes=13)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = fused_mod.calibrate_chain_scales(cfg, folded, x)
    qtree = fused_mod.quantize_chain(cfg, folded)
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)

    calls = []
    real = block_mod.basic_ds_block_s2_int8

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(fused_mod, "BASIC_DS_INT8", True)
    monkeypatch.setattr(block_mod, "basic_ds_block_s2_int8", spy)
    got = np.asarray(
        fused_mod.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    assert len(calls) == 3, f"expected 3 ds transitions, saw {len(calls)}"
    rel = np.mean(np.abs(got - ref)) / (np.mean(np.abs(ref)) + 1e-9)
    assert rel < 0.08, rel
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_fused_forward_int8_chain_basic_close_to_fp(rng):
    """The int8_chain backend covers the BASIC family (ResNet-18/34): every
    stride-1 block one megakernel, stage transitions bf16 XLA — logits stay
    close to the fp folded path."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet18", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(4))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))

    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    taps: list = []
    got = np.asarray(
        fused_forward_int8_chain(
            cfg, qtree, scales, x, interpret=True, stage_taps=taps
        ),
        np.float32,
    )
    assert len(taps) == 4
    rel_mae = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel_mae < 0.05, rel_mae
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_basic_run_chained_int8_matches_sequential_blocks(rng):
    """The basic run megakernel (N BasicBlocks, one kernel, VMEM ping-pong)
    BIT-matches the same N blocks through basic_block_chained_int8."""
    from resnetc_tpu.ops.pallas.block import (
        basic_block_chained_int8,
        basic_run_chained_int8,
        pad_for_chain,
        quantize_basic_block,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    b, h, c = 2, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, h, c), dtype=np.float32))

    def mk():
        return quantize_basic_block({
            "conv1": {
                "weight": jnp.asarray(
                    rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
                ),
                "bias": jnp.asarray(
                    rng.standard_normal((c,), dtype=np.float32) * 0.1
                ),
            },
            "conv2": {
                "weight": jnp.asarray(
                    rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1
                ),
                "bias": jnp.asarray(
                    rng.standard_normal((c,), dtype=np.float32) * 0.1
                ),
            },
        })

    qs = [mk(), mk()]
    s = [4.0 / 127, 3.0 / 127, 4.5 / 127]
    scales0 = jnp.asarray([s[0], s[1], s[2]], jnp.float32)
    scales1 = jnp.asarray([s[2], s[1], 1.0], jnp.float32)
    xr = pad_for_chain(quantize_with_scale(x, jnp.float32(s[0])))

    def one(q, xq, sc, emit):
        return basic_block_chained_int8(
            xq,
            q["w1pq"], q["sw1p"], q["b1"],
            q["w2pq"], q["sw2p"], q["b2"],
            sc, h=h, w_sp=h, emit_i8=emit, interpret=True,
        )

    ref = one(qs[1], one(qs[0], xr, scales0, True), scales1, False)

    stk = lambda key: jnp.stack([q[key] for q in qs])
    got = basic_run_chained_int8(
        xr,
        stk("w1pq"), stk("sw1p"), stk("b1"),
        stk("w2pq"), stk("sw2p"), stk("b2"),
        jnp.stack([scales0, scales1]),
        h=h, w_sp=h, emit_i8=False, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_int8_chain_basic_run_fuse_bitmatch(rng, monkeypatch):
    """BASIC_RUN_FUSE_STAGES must (a) take the run branch and (b) produce
    bit-identical resnet18 logits to the per-block path."""
    from resnetc_tpu.ops.pallas import block as block_mod
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet18", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(7))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    monkeypatch.setattr(fused_mod, "BASIC_RUN_FUSE_STAGES", ())
    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )

    calls = []
    real_run = block_mod.basic_run_chained_int8

    def spy(*args, **kwargs):
        calls.append(True)
        return real_run(*args, **kwargs)

    monkeypatch.setattr(fused_mod, "BASIC_RUN_FUSE_STAGES", (0, 1, 2, 3))
    monkeypatch.setattr(block_mod, "basic_run_chained_int8", spy)
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    assert calls, "basic run branch never executed"
    np.testing.assert_array_equal(got, want)


def test_fused_forward_int8_chain_resnet101_close_to_fp(rng):
    """The deep end of the family (resnet101: 23-block layer3) through the
    same int8 megakernel pipeline — pins that the c-keyed bt tables and
    per-block scale chaining generalize past resnet50."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet101", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(9))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))

    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    got = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True), np.float32
    )
    rel_mae = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel_mae < 0.05, rel_mae
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_percentile_calibration_robust_to_outliers(rng):
    """With a calibration batch carrying rare extreme activations,
    percentile calibration (clip + saturate) must yield LOWER e2e int8
    error on clean data than absmax (which stretches the int8 grid to fit
    the outliers)."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)

    x_clean = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))
    # Outlier calibration batch: a few pixels 60 sigma out — absmax scales
    # blow up at every layer the outliers propagate through.
    x_cal = np.asarray(x_clean).copy()
    x_cal[0, :2, :2, :] = 60.0
    x_cal = jnp.asarray(x_cal)

    ref = np.asarray(resnet.forward_folded(cfg, folded, x_clean), np.float32)
    qtree = quantize_chain(cfg, folded)

    errs = {}
    for method in ("absmax", "percentile", "mse"):
        scales = calibrate_chain_scales(cfg, folded, x_cal, method=method)
        got = np.asarray(
            fused_forward_int8_chain(
                cfg, qtree, scales, x_clean, interpret=True
            ),
            np.float32,
        )
        errs[method] = float(np.mean(np.abs(got - ref)) / np.mean(np.abs(ref)))

    assert errs["percentile"] < errs["absmax"], errs
    # And percentile stays accurate in absolute terms on clean data.
    assert errs["percentile"] < 0.08, errs
    # MSE-optimal clipping must also beat absmax here (it sees the same
    # outliers but refuses to spend grid range on them when the MSE says
    # clipping is cheaper).
    assert errs["mse"] < errs["absmax"], errs
    assert errs["mse"] < 0.08, errs


def test_fused_forward_int8_chain_resnet34_close_to_fp(rng):
    """resnet34 through int8_chain with run fusion forced on every stage:
    multi-block basic runs (N=3..5) through basic_run_chained_int8 e2e."""
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet34", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(11))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))

    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)
    old = fused_mod.BASIC_RUN_FUSE_STAGES
    try:
        fused_mod.BASIC_RUN_FUSE_STAGES = (0, 1, 2, 3)
        got = np.asarray(
            fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
            np.float32,
        )
    finally:
        fused_mod.BASIC_RUN_FUSE_STAGES = old
    rel_mae = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel_mae < 0.05, rel_mae
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_pick_bt_ds_s2_measured_hit_respects_vmem_budget():
    """The c=512 measured-table hit (bt=8) must be taken at the REAL
    production 224px L4ds geometry (hq=wq=8 — chain_meta pads 14 -> 16;
    its ~13.9MB working set is above the 9MB perf-walk budget but far
    under the 100MB compile cap and was the measured -6% winner), and must
    fall through at cap-threatening geometry (image-size ≥ ~448) instead
    of forcing a no-compile bt=8 (ADVICE r3 medium + r4 review)."""
    from resnetc_tpu.ops.pallas.block import _pick_bt_ds_s2, chain_meta

    hp, wp = chain_meta(0, 14, 14)  # the 224px L4ds input stage
    assert (hp // 2, wp // 2) == (8, 8)
    assert _pick_bt_ds_s2(256, 8, 8, 1024, 512, 2048) == 8
    # 448-class input: bt=8's working set approaches the Mosaic cap ->
    # must fall through to the walk, never return 8.
    big = _pick_bt_ds_s2(256, 28, 28, 1024, 512, 2048)
    assert big < 8 and 256 % big == 0


def test_per_channel_interior_bake_improves_accuracy(rng):
    """bake_interior_scales (per-channel z1/z2 vectors folded into host
    constants, kernels untouched) must not lose to per-tensor calibration
    e2e, and must keep fp argmax."""
    from resnetc_tpu.ops.pallas.fused import (
        bake_interior_scales,
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)

    s_pt = calibrate_chain_scales(cfg, folded, x)
    got_pt = np.asarray(
        fused_forward_int8_chain(
            cfg, quantize_chain(cfg, folded), s_pt, x, interpret=True
        ),
        np.float32,
    )
    s_pc = calibrate_chain_scales(cfg, folded, x, per_channel_interior=True)
    q_pc, s_rt = bake_interior_scales(cfg, folded, s_pc)
    got_pc = np.asarray(
        fused_forward_int8_chain(cfg, q_pc, s_rt, x, interpret=True),
        np.float32,
    )

    rel = lambda g: np.mean(np.abs(g - ref)) / np.mean(np.abs(ref))
    # Measured: 0.0283 -> 0.0181 on this fixture (-36%); gate at parity
    # with a little slack so the assertion pins the mechanism, not noise.
    assert rel(got_pc) <= rel(got_pt) * 1.05, (rel(got_pc), rel(got_pt))
    assert (got_pc.argmax(-1) == ref.argmax(-1)).all()


def test_per_channel_bake_basic_ds_branch(rng, monkeypatch):
    """The bake must cover the basic family end to end with the basic-ds
    megakernel transitions on (joint-scale division branch) AND leave the
    restored fp entries un-prescaled (the bf16 XLA branch reads them)."""
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        bake_interior_scales,
        calibrate_chain_scales,
        fused_forward_int8_chain,
    )

    cfg = resnet.get_config("resnet18", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(7))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)

    s_pc = calibrate_chain_scales(cfg, folded, x, per_channel_interior=True)
    q_pc, s_rt = bake_interior_scales(cfg, folded, s_pc)
    # fp transition entries must equal the ORIGINAL folded weights.
    for stage in (2, 3, 4):
        blk = q_pc[f"layer{stage}"]["0"]
        np.testing.assert_array_equal(
            np.asarray(blk["conv2"]["weight"]),
            np.asarray(folded[f"layer{stage}"]["0"]["conv2"]["weight"]),
        )
    for flag in (False, True):
        monkeypatch.setattr(fused_mod, "BASIC_DS_INT8", flag)
        got = np.asarray(
            fused_forward_int8_chain(cfg, q_pc, s_rt, x, interpret=True),
            np.float32,
        )
        rel = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
        assert rel < 0.05, (flag, rel)
        assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9, flag


def test_pick_batch_tile_full_stack_fits_scoped_vmem():
    """The conv bt picker must model the FULL Mosaic stack (double-buffered
    input/output/weight blocks + accumulator + in-kernel temporaries), not
    just input+acc: at the resnet18 b256 L4 transition conv shape
    ((256,7,7,512) + residual) the old 6MB input+acc heuristic chose bt=16,
    whose real stack Mosaic priced at 16.22MB > the 16MB scoped limit
    (chip compile failure, 2026-08-19).  bt=8's stack is ~8MB."""
    from resnetc_tpu.ops.pallas.conv import _pick_batch_tile

    bt = _pick_batch_tile(
        256, 81, 512, 256,
        w_block_bytes=9 * 512 * 256 * 2, out_bufs=2, itemsize=2,
    )
    assert bt <= 8 and 256 % bt == 0, bt
    # The measured tiles at the healthy-path shapes must not shrink (these
    # pin the bf16 pallas backend's round-2 measured configs).
    assert _pick_batch_tile(256, 58 * 58, 64, 128,
                            w_block_bytes=9 * 64 * 128 * 2) == 2
    assert _pick_batch_tile(256, 30 * 30, 128, 128,
                            w_block_bytes=9 * 128 * 128 * 2) == 4
    assert _pick_batch_tile(256, 16 * 16, 256, 256,
                            w_block_bytes=9 * 256 * 256 * 2) == 8


def test_int8_chain_hybrid_xla_prefix(rng, monkeypatch):
    """HYBRID_XLA_STAGES serves the leading stages as XLA bf16 and enters
    the int8 chain at the boundary scale (ROOFLINE.json motivation: L1
    Pallas efficiency 0.18-0.30 vs L3/L4 at 0.6-0.96).  Logits must stay
    within the same gates as the pure chain vs the fp folded reference —
    in fact strictly closer on the quantization axis, since the prefix
    skips the L1 int8 rounding."""
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    for stages in [(0,), (0, 1)]:
        monkeypatch.setattr(fused_mod, "HYBRID_XLA_STAGES", stages)
        taps: list = []
        got = np.asarray(
            fused_forward_int8_chain(
                cfg, qtree, scales, x, interpret=True, stage_taps=taps
            ),
            np.float32,
        )
        rel = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
        assert rel < 0.05, (stages, rel)
        assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9, stages
        assert len(taps) == 4, (stages, len(taps))


def test_int8_chain_hybrid_with_interior_bake(rng, monkeypatch):
    """The per-channel interior bake prescales the folded tree before
    quantization — the hybrid prefix's fp entries must be restored
    UN-prescaled (a leak would skew every XLA-prefix activation by the
    z1/z2 vectors and this gate would blow up)."""
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        bake_interior_scales,
        calibrate_chain_scales,
        fused_forward_int8_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    scales_pc = calibrate_chain_scales(cfg, folded, x, per_channel_interior=True)
    q_pc, s_rt = bake_interior_scales(cfg, folded, scales_pc)

    monkeypatch.setattr(fused_mod, "HYBRID_XLA_STAGES", (0,))
    got = np.asarray(
        fused_forward_int8_chain(cfg, q_pc, s_rt, x, interpret=True),
        np.float32,
    )
    rel = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel < 0.05, rel
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.9


def test_int8_chain_hybrid_rejects_bad_stage_sets(rng, monkeypatch):
    """Non-prefix stage sets and stages without kept fp entries must fail
    loudly at trace time, not produce silently-wrong logits."""
    from resnetc_tpu.ops.pallas import fused as fused_mod
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    for bad in [(1,), (0, 2)]:
        monkeypatch.setattr(fused_mod, "HYBRID_XLA_STAGES", bad)
        with pytest.raises(ValueError, match="contiguous prefix"):
            fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(fused_mod, "HYBRID_XLA_STAGES", (0, 1, 2))
    with pytest.raises(ValueError, match="folded fp entries"):
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)


def test_chained_int8_pixel_pair_bitmatch(rng):
    """The pixel-paired L1 kernel must be bit-identical to the standard
    chain kernel: the pairing only regroups EXACT int32 dot accumulations
    (block-diag conv1/conv3 add zero products; the pair-space conv2 sums
    the same tap products per kh slice) and every f32 epilogue op runs in
    the same order on lane-tiled vectors.  Covers identity + projection
    forms, i8 and bf16 exits, and bt=2 grid stepping."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        bottleneck_block_chained_int8_pp,
        chain_meta,
        quantize_chain_block,
        quantize_ds_block,
    )

    h, cin, c = 8, 256, 64  # chain_meta -> wp=16 (even), wpp=8
    hp, wp = chain_meta(0, h, h)
    assert wp % 2 == 0
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q = quantize_chain_block(blk)
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)
    args = (
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], scales,
    )
    for emit_i8 in (True, False):
        kw = dict(h=h, w_sp=h, emit_i8=emit_i8, interpret=True, bt=2)
        base = bottleneck_block_chained_int8(*args, **kw)
        pp = bottleneck_block_chained_int8_pp(*args, **kw)
        assert pp.shape == base.shape and pp.dtype == base.dtype
        assert jnp.array_equal(base, pp), f"emit_i8={emit_i8}"

    # Projection form (L1 block 0: cin=64 pool output, 4c=256 out).
    cin0 = 64
    blk0 = {
        "conv1": {"weight": g(cin0, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
    }
    q0 = quantize_chain_block(blk0)
    qd = quantize_ds_block(
        dict(blk0, downsample={"weight": g(cin0, 4 * c), "bias": g(4 * c)})
    )
    xr0 = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin0)), jnp.int8)
    args0 = (
        xr0, q0["w1q"], q0["sw1"], q0["b1"], q0["w2pq"], q0["sw2p"], q0["b2"],
        q0["w3q"], q0["sw3"], q0["b3"], scales,
    )
    kwp = dict(h=h, w_sp=h, emit_i8=True, interpret=True, bt=2,
               wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    base_p = bottleneck_block_chained_int8(*args0, **kwp)
    pp_p = bottleneck_block_chained_int8_pp(*args0, **kwp)
    assert jnp.array_equal(base_p, pp_p)


def test_int8_chain_l1_pixel_pair_e2e_bitmatch(rng, monkeypatch):
    """fused_forward_int8_chain with L1_PIXEL_PAIR must match the default
    engine bit-for-bit in interpret mode (stage 0 rerouted, run-fusion
    overridden; everything downstream reads the identical chain buffer)."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused

    cfg = resnet.get_config("resnet50")
    cfg = cfg.__class__(**{**cfg.__dict__, "stage_blocks": (2, 2, 2, 2)})
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        rng.standard_normal((2, 64, 64, 3), dtype=np.float32), jnp.bfloat16
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x.astype(jnp.float32))
    qtree = fused.quantize_chain(cfg, folded)

    base = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    pp = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    assert jnp.array_equal(base, pp)


def test_run_chained_int8_pp_matches_sequential_pp_blocks(rng):
    """The pp run kernel must bit-match the same blocks served sequentially
    through bottleneck_block_chained_int8_pp (same op orders; the only
    difference is activations staying in VMEM)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8_pp,
        bottleneck_run_chained_int8_pp,
        chain_meta,
        quantize_chain_block,
    )

    h, cin, c = 8, 256, 64
    hp, wp = chain_meta(0, h, h)
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blks, scl = [], []
    for i in range(2):
        blks.append(quantize_chain_block({
            "conv1": {"weight": g(cin, c), "bias": g(c)},
            "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
            "conv3": {"weight": g(c, 4 * c), "bias": g(4 * c)},
        }))
        scl.append([0.03 if i == 0 else 0.02, 0.02, 0.03, 0.02])
    scl[0][3] = scl[1][0]  # chain contract: block i's s_y == block i+1's s_x
    scales_s = jnp.asarray(scl, jnp.float32)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)

    for emit_i8 in (True, False):
        seq = xr
        for i, q in enumerate(blks):
            seq = bottleneck_block_chained_int8_pp(
                seq, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"],
                q["b2"], q["w3q"], q["sw3"], q["b3"], scales_s[i],
                h=h, w_sp=h, emit_i8=emit_i8 or i < 1, interpret=True, bt=2)
        stk = lambda key: jnp.stack([q[key] for q in blks])
        run = bottleneck_run_chained_int8_pp(
            xr, stk("w1q"), stk("sw1"), stk("b1"),
            stk("w2pq"), stk("sw2p"), stk("b2"),
            stk("w3q"), stk("sw3"), stk("b3"), scales_s,
            h=h, w_sp=h, emit_i8=emit_i8, interpret=True, bt=2)
        assert run.dtype == seq.dtype
        assert jnp.array_equal(seq, run), f"emit_i8={emit_i8}"


def test_basic_chained_int8_pp_bitmatch(rng):
    """Pixel-paired basic block + run must bit-match the standard basic
    kernels (same int32/f32 op orders; see the bottleneck pp tests)."""
    from resnetc_tpu.ops.pallas.block import (
        basic_block_chained_int8,
        basic_block_chained_int8_pp,
        basic_run_chained_int8_pp,
        chain_meta,
        quantize_basic_block,
    )

    h, c = 8, 64
    hp, wp = chain_meta(0, h, h)
    assert wp % 2 == 0
    b = 4
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blks, scl = [], []
    for i in range(2):
        blks.append(quantize_basic_block({
            "conv1": {"weight": g(3, 3, c, c), "bias": g(c)},
            "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        }))
        scl.append([0.03 if i == 0 else 0.025, 0.02, 0.025])
    scl[0][2] = scl[1][0]
    scales_s = jnp.asarray(scl, jnp.float32)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, c)), jnp.int8)

    for emit_i8 in (True, False):
        kw = dict(h=h, w_sp=h, emit_i8=emit_i8, interpret=True, bt=2)
        base = basic_block_chained_int8(
            xr, blks[0]["w1pq"], blks[0]["sw1p"], blks[0]["b1"],
            blks[0]["w2pq"], blks[0]["sw2p"], blks[0]["b2"],
            scales_s[0], **kw)
        pp = basic_block_chained_int8_pp(
            xr, blks[0]["w1pq"], blks[0]["sw1p"], blks[0]["b1"],
            blks[0]["w2pq"], blks[0]["sw2p"], blks[0]["b2"],
            scales_s[0], **kw)
        assert pp.dtype == base.dtype
        assert jnp.array_equal(base, pp), f"emit_i8={emit_i8}"

    # pp run vs sequential pp blocks.
    seq = xr
    for i, q in enumerate(blks):
        seq = basic_block_chained_int8_pp(
            seq, q["w1pq"], q["sw1p"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            scales_s[i], h=h, w_sp=h, emit_i8=True, interpret=True, bt=2)
    stk = lambda key: jnp.stack([q[key] for q in blks])
    run = basic_run_chained_int8_pp(
        xr, stk("w1pq"), stk("sw1p"), stk("b1"),
        stk("w2pq"), stk("sw2p"), stk("b2"), scales_s,
        h=h, w_sp=h, emit_i8=True, interpret=True, bt=2)
    assert jnp.array_equal(seq, run)


def test_basic_int8_chain_pp_e2e_bitmatch(rng, monkeypatch):
    """resnet18-family e2e with L1_PIXEL_PAIR must match the default basic
    chain engine bit-for-bit in interpret mode."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused

    cfg = resnet.get_config("resnet18")
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        rng.standard_normal((2, 64, 64, 3), dtype=np.float32), jnp.bfloat16
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x.astype(jnp.float32))
    qtree = fused.quantize_chain(cfg, folded)

    base = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    pp = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    assert jnp.array_equal(base, pp)


def test_int8_chain_pp_run_vmem_fallback(rng, monkeypatch):
    """When the pp run kernel does not fit VMEM, stage 0 must degrade to
    per-block pp kernels with identical output (mirrors
    test_int8_chain_run_fuse_vmem_fallback for the pp route)."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import block, fused

    cfg = resnet.get_config("resnet50")
    cfg = cfg.__class__(**{**cfg.__dict__, "stage_blocks": (2, 2, 2, 2)})
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        rng.standard_normal((2, 64, 64, 3), dtype=np.float32), jnp.bfloat16
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x.astype(jnp.float32))
    qtree = fused.quantize_chain(cfg, folded)

    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    with_run = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(block, "_pick_bt_run_int8_pp",
                        lambda *a, **k: 0)
    per_block = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    assert jnp.array_equal(with_run, per_block)


def test_int8_chain_pp_guard_wide_variant(rng, monkeypatch):
    """L1_PIXEL_PAIR must be inert (std kernels, identical output) on
    bottleneck variants whose stage 0 runs at c>=128 (wide_resnet style) —
    the pp kernels are c=64-only."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused

    cfg = resnet.get_config("wide_resnet50_2")
    cfg = cfg.__class__(**{**cfg.__dict__, "stage_blocks": (1, 1, 1, 1)})
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        rng.standard_normal((1, 64, 64, 3), dtype=np.float32), jnp.bfloat16
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x.astype(jnp.float32))
    qtree = fused.quantize_chain(cfg, folded)

    base = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    pp = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    assert jnp.array_equal(base, pp)


def test_int8_chain_pp_whole_stage_proj_bitmatch(rng, monkeypatch):
    """L1_PIXEL_PAIR + STAGE_FUSE_PROJ: the whole-stage pp run kernel
    (projection block 0 included) must bit-match the per-block pp path."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused

    cfg = resnet.get_config("resnet50")
    cfg = cfg.__class__(**{**cfg.__dict__, "stage_blocks": (2, 2, 2, 2)})
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        rng.standard_normal((2, 64, 64, 3), dtype=np.float32), jnp.bfloat16
    )
    scales = fused.calibrate_chain_scales(cfg, folded, x.astype(jnp.float32))
    qtree = fused.quantize_chain(cfg, folded)

    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    base = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    monkeypatch.setattr(fused, "STAGE_FUSE_PROJ", True)
    whole = fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True)
    assert jnp.array_equal(base, whole)
