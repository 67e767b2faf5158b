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


def test_bottleneck_block_chained_matches_oracle(rng):
    """The padded-row chained variant: a 3-block chain (one pad, three
    kernels, one unpad) must equal three oracle blocks — in particular the
    garbage ring rows of intermediate outputs must never leak into the
    interior (the where-mask NaN-kill property)."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained,
        pad_for_chain,
        unpad_from_chain,
    )

    b, h, c = 2, 9, 16
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
