"""Int8 quantization tests: kernel vs dequant oracle, model-level accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import quant
from resnetc_tpu.ops.pallas.fused import fused_forward_int8
from resnetc_tpu.tensor import FP32


def test_quantize_per_channel_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 32), dtype=np.float32))
    w_q, scale = quant.quantize_per_channel(w)
    assert w_q.dtype == jnp.int8
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    # Quantization step is absmax/127 per column -> error <= half a step.
    step = np.asarray(scale)
    assert (np.abs(deq - np.asarray(w)) <= 0.5 * step[None, :] + 1e-6).all()


def test_quantize_per_tensor_scale(rng):
    x = jnp.asarray(rng.standard_normal((8, 8), dtype=np.float32)) * 3
    x_q, scale = quant.quantize_per_tensor(x)
    assert int(np.abs(np.asarray(x_q)).max()) <= 127
    np.testing.assert_allclose(
        float(scale), float(np.abs(np.asarray(x)).max()) / 127.0, rtol=1e-6
    )


def test_quantize_zero_tensor():
    x_q, scale = quant.quantize_per_tensor(jnp.zeros((4, 4)))
    assert float(scale) == 1.0
    assert (np.asarray(x_q) == 0).all()


def test_int8_matmul_matches_dequant_oracle(rng):
    m, k, n = 128, 256, 192
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((n,), dtype=np.float32))

    x_q, sx = quant.quantize_per_tensor(x)
    w_q, sw = quant.quantize_per_channel(w)

    # Oracle: exact integer matmul then dequant.
    acc = np.asarray(x_q, np.int32) @ np.asarray(w_q, np.int32)
    ref = np.maximum(
        acc.astype(np.float32) * float(sx) * np.asarray(sw)[None, :] + np.asarray(bias), 0
    )
    got = quant.int8_matmul(
        x_q, w_q, sx, sw, bias, relu=True, out_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-4)


def test_int8_quantization_error_bounded(rng):
    """End-to-end dequantized matmul must stay close to the fp32 product."""
    m, k, n = 64, 128, 64
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32) * 0.1)
    x_q, sx = quant.quantize_per_tensor(x)
    w_q, sw = quant.quantize_per_channel(w)
    got = np.asarray(
        quant.int8_matmul(x_q, w_q, sx, sw, out_dtype=jnp.float32, interpret=True)
    )
    ref = np.asarray(x) @ np.asarray(w)
    # int8 relative error on a k=128 dot is ~1%.
    assert np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9) < 0.02


def test_quantize_folded_structure():
    cfg = resnet.get_config("resnet50", num_classes=16)
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    q = quant.quantize_folded(folded)
    blk = q["layer1"]["0"]
    assert "w_q" in blk["conv1"] and blk["conv1"]["w_q"].dtype == jnp.int8
    assert "w_q" in blk["conv3"] and "w_q" in blk["downsample"]
    assert "weight" in blk["conv2"]  # 3x3 stays fp
    assert "w_q" in q["fc"] and q["fc"]["w_q"].shape == (cfg.feature_dim, 16)


def test_int8_forward_argmax_agrees_with_fp(rng):
    """Mixed int8 serving must keep the top-1 class on a small model."""
    cfg = resnet.get_config("resnet18", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(1))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))

    ref = resnet.forward_folded(cfg, folded, x, policy=FP32)
    q = quant.quantize_folded(folded)
    got = fused_forward_int8(cfg, q, x, policy=FP32, interpret=True)
    assert np.asarray(got).argmax(-1).tolist() == np.asarray(ref).argmax(-1).tolist()
    rel = np.abs(np.asarray(got) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-9
    )
    assert rel < 0.15, rel


def test_static_calibrated_int8_matches_dynamic(rng):
    """Calibrated static scales must track the dynamic path closely and keep
    argmax (calibration batch == serving batch -> scales near-identical)."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_activation_scales,
        fused_forward_int8_static,
    )

    cfg = resnet.get_config("resnet50", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    q = quant.quantize_folded(folded)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))

    scales = calibrate_activation_scales(cfg, folded, x, policy=FP32)
    assert float(scales["fc"]) > 0
    assert "conv1" in scales["layer1"]["0"]

    ref = resnet.forward_folded(cfg, folded, x, policy=FP32)
    got = fused_forward_int8_static(cfg, q, scales, x, policy=FP32, interpret=True)
    assert np.asarray(got).argmax(-1).tolist() == np.asarray(ref).argmax(-1).tolist()
    rel = np.abs(np.asarray(got) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-9
    )
    assert rel < 0.2, rel
