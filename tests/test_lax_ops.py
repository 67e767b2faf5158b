"""Golden tests: every XLA oracle op vs torch.nn.functional (fp32).

This is the assertion-based replacement for the reference's print-and-eyeball
kernel tests (cuda/test.cu — no assertions, no main, stale arg orders).
Semantics pinned: zero-pad conv without bias, -inf-padded maxpool,
count_include_pad avgpool, [out,in] linear weights, running-stat BN, eps=1e-5.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from resnetc_tpu.ops import lax_ops
from resnetc_tpu.tensor import nchw_to_nhwc, nhwc_to_nchw, oihw_to_hwio


def _conv_case(rng, b, cin, cout, hw, k, stride, padding):
    x = rng.standard_normal((b, cin, hw, hw), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k, k), dtype=np.float32) * 0.1
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=padding)
    ours = lax_ops.conv2d(
        nchw_to_nhwc(jnp.asarray(x)), oihw_to_hwio(jnp.asarray(w)),
        stride=stride, padding=padding,
    )
    np.testing.assert_allclose(
        np.asarray(nhwc_to_nchw(ours)), ref.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "b,cin,cout,hw,k,stride,padding",
    [
        (2, 3, 8, 16, 7, 2, 3),  # stem-shaped
        (2, 8, 16, 14, 3, 1, 1),  # 3x3 stride 1
        (1, 8, 16, 14, 3, 2, 1),  # 3x3 stride 2
        (2, 16, 4, 9, 1, 1, 0),  # pointwise
        (1, 4, 4, 9, 1, 2, 0),  # 1x1 stride-2 downsample
        (1, 2, 3, 5, 5, 3, 2),  # odd sizes
    ],
)
def test_conv2d_matches_torch(rng, b, cin, cout, hw, k, stride, padding):
    _conv_case(rng, b, cin, cout, hw, k, stride, padding)


@pytest.mark.parametrize("k,stride,padding,hw", [(3, 2, 1, 16), (2, 2, 0, 8), (3, 1, 1, 7)])
def test_max_pool2d_matches_torch(rng, k, stride, padding, hw):
    x = rng.standard_normal((2, 6, hw, hw), dtype=np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), k, stride=stride, padding=padding)
    ours = lax_ops.max_pool2d(
        nchw_to_nhwc(jnp.asarray(x)), kernel_size=k, stride=stride, padding=padding
    )
    np.testing.assert_allclose(np.asarray(nhwc_to_nchw(ours)), ref.numpy(), rtol=0, atol=0)


@pytest.mark.parametrize("k,stride,padding,hw", [(7, 1, 0, 7), (3, 2, 1, 16), (2, 2, 0, 8)])
def test_avg_pool2d_matches_torch_count_include_pad(rng, k, stride, padding, hw):
    x = rng.standard_normal((2, 6, hw, hw), dtype=np.float32)
    # Reference divisor is always k*k (cuda/ops.cu:107) == count_include_pad=True.
    ref = F.avg_pool2d(
        torch.from_numpy(x), k, stride=stride, padding=padding, count_include_pad=True
    )
    ours = lax_ops.avg_pool2d(
        nchw_to_nhwc(jnp.asarray(x)), kernel_size=k, stride=stride, padding=padding
    )
    np.testing.assert_allclose(np.asarray(nhwc_to_nchw(ours)), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_global_avg_pool_matches_adaptive(rng):
    x = rng.standard_normal((3, 16, 7, 7), dtype=np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), (1, 1)).flatten(1)
    ours = lax_ops.global_avg_pool(nchw_to_nhwc(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bias", [True, False])
def test_linear_matches_torch(rng, bias):
    x = rng.standard_normal((4, 32), dtype=np.float32)
    w = rng.standard_normal((10, 32), dtype=np.float32) * 0.1
    b = rng.standard_normal((10,), dtype=np.float32) if bias else None
    ref = F.linear(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(b) if bias else None,
    )
    ours = lax_ops.linear(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b) if bias else None
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_relu_and_add(rng):
    a = rng.standard_normal((100,), dtype=np.float32)
    b = rng.standard_normal((100,), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(lax_ops.relu(jnp.asarray(a))), np.maximum(a, 0))
    np.testing.assert_allclose(
        np.asarray(lax_ops.add(jnp.asarray(a), jnp.asarray(b))), a + b, rtol=1e-7
    )


def test_batch_norm_inference_matches_torch(rng):
    c = 16
    x = rng.standard_normal((2, c, 8, 8), dtype=np.float32)
    scale = rng.standard_normal((c,), dtype=np.float32)
    bias = rng.standard_normal((c,), dtype=np.float32)
    mean = rng.standard_normal((c,), dtype=np.float32)
    var = rng.random((c,), dtype=np.float32) + 0.5
    ref = F.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), training=False, eps=1e-5,
    )
    ours = lax_ops.batch_norm_inference(
        nchw_to_nhwc(jnp.asarray(x)), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(mean), jnp.asarray(var),
    )
    np.testing.assert_allclose(np.asarray(nhwc_to_nchw(ours)), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_train_matches_torch(rng):
    c = 8
    x = rng.standard_normal((4, c, 6, 6), dtype=np.float32)
    scale = rng.standard_normal((c,), dtype=np.float32)
    bias = rng.standard_normal((c,), dtype=np.float32)
    rmean = rng.standard_normal((c,), dtype=np.float32)
    rvar = rng.random((c,), dtype=np.float32) + 0.5

    t_rmean = torch.from_numpy(rmean.copy())
    t_rvar = torch.from_numpy(rvar.copy())
    ref = F.batch_norm(
        torch.from_numpy(x), t_rmean, t_rvar,
        torch.from_numpy(scale), torch.from_numpy(bias),
        training=True, momentum=0.1, eps=1e-5,
    )

    ours, new_mean, new_var = lax_ops.batch_norm_train(
        nchw_to_nhwc(jnp.asarray(x)), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(rmean), jnp.asarray(rvar),
    )
    np.testing.assert_allclose(np.asarray(nhwc_to_nchw(ours)), ref.numpy(), rtol=1e-4, atol=1e-5)
    # torch mutates the running buffers in place in training mode.
    np.testing.assert_allclose(np.asarray(new_mean), t_rmean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_var), t_rvar.numpy(), rtol=1e-5, atol=1e-6)


def test_fold_bn_into_conv_is_exact(rng):
    cin, cout, k = 4, 8, 3
    x = rng.standard_normal((2, cin, 9, 9), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k, k), dtype=np.float32) * 0.1
    scale = rng.standard_normal((cout,), dtype=np.float32)
    bias = rng.standard_normal((cout,), dtype=np.float32)
    mean = rng.standard_normal((cout,), dtype=np.float32)
    var = rng.random((cout,), dtype=np.float32) + 0.5

    xh = nchw_to_nhwc(jnp.asarray(x))
    wh = oihw_to_hwio(jnp.asarray(w))
    unfused = lax_ops.batch_norm_inference(
        lax_ops.conv2d(xh, wh, stride=1, padding=1),
        jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(mean), jnp.asarray(var),
    )
    fw, fb = lax_ops.fold_bn_into_conv(
        wh, jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(mean), jnp.asarray(var)
    )
    fused = lax_ops.conv2d(xh, fw, stride=1, padding=1) + fb.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), rtol=1e-4, atol=1e-5)
