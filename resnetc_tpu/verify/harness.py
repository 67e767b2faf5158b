"""Parity comparisons: our JAX model vs the PyTorch twin.

Replaces the reference's manual dump/allclose/breakpoint loop
(pytorch_inference.py:8-11 + cuda/tensor.cuh:154-163) with assertable
metrics.  The acceptance gates come from BASELINE.md: top-1 argmax match and
logit MAE <= 1e-3 vs the PyTorch reference (in fp32 mode; the bf16 path is
gated on argmax + a looser MAE so dtype error is separated from bugs).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from resnetc_tpu.checkpoint import variables_from_torch_state_dict
from resnetc_tpu.models.resnet import ResNetConfig, forward  # noqa: F401
from resnetc_tpu.tensor import DtypePolicy, FP32, nchw_to_nhwc

#: End-to-end fp32 logit gate (BASELINE.json north star).
LOGIT_MAE_GATE = 1e-3


@dataclasses.dataclass(frozen=True)
class LogitReport:
    mae: float
    max_abs_err: float
    argmax_match_rate: float
    top1_ours: np.ndarray
    top1_ref: np.ndarray

    @property
    def argmax_match(self) -> bool:
        return self.argmax_match_rate == 1.0


def compare_logits(ours: np.ndarray, ref: np.ndarray) -> LogitReport:
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    if ours.shape != ref.shape:
        raise ValueError(f"logit shape mismatch: {ours.shape} vs {ref.shape}")
    err = np.abs(ours - ref)
    top1_ours = ours.argmax(axis=-1)
    top1_ref = ref.argmax(axis=-1)
    return LogitReport(
        mae=float(err.mean()),
        max_abs_err=float(err.max()),
        argmax_match_rate=float((top1_ours == top1_ref).mean()),
        top1_ours=top1_ours,
        top1_ref=top1_ref,
    )


def logit_report(
    cfg: ResNetConfig,
    twin,  # TorchResNet
    x_nchw: np.ndarray,
    *,
    policy: DtypePolicy = FP32,
) -> LogitReport:
    """Run the same NCHW fp32 batch through the torch twin (eval mode) and our
    jitted forward (weights imported from the twin), and compare logits."""
    import torch

    variables = variables_from_torch_state_dict(twin.state_dict())
    x = jax.numpy.asarray(x_nchw, jax.numpy.float32)
    ours, _ = jax.jit(
        lambda v, xx: forward(cfg, v, nchw_to_nhwc(xx), train=False, policy=policy)
    )(variables, x)

    twin.eval()
    with torch.no_grad():
        ref = twin(torch.from_numpy(np.asarray(x_nchw, np.float32))).numpy()
    return compare_logits(np.asarray(ours), ref)


def stage_parity_report(
    cfg: ResNetConfig,
    twin,  # TorchResNet
    x_nchw: np.ndarray,
    *,
    policy: DtypePolicy = FP32,
) -> dict[str, dict[str, float]]:
    """Per-stage activation comparison: stem, layer1..4, logits.

    The automated version of the reference's layer-by-layer check_out loop
    (pytorch_inference.py:8-11 + Tensor::save dumps): runs both models,
    taps each stage boundary, and returns {'stage': {'mae': ..., 'max': ...}}
    so a numerics regression is localised to the first diverging stage
    instead of debugged from final logits.
    """
    import torch

    from resnetc_tpu.models.resnet import _block_forward, _conv_bn_act
    from resnetc_tpu.ops import lax_ops

    variables = variables_from_torch_state_dict(twin.state_dict())
    xj = nchw_to_nhwc(jax.numpy.asarray(np.asarray(x_nchw, np.float32)))

    # Ours, stage by stage (same math as models.resnet.forward, eval mode).
    taps: dict[str, np.ndarray] = {}
    y = xj.astype(policy.compute)
    y, _ = _conv_bn_act(
        y, variables["conv1"], variables["bn1"], stride=2, padding=3, act=True,
        train=False, axis_name=None, policy=policy,
    )
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)
    taps["stem"] = np.asarray(y, np.float32)
    for stage in range(4):
        layer = f"layer{stage + 1}"
        stage_stride = 1 if stage == 0 else 2
        for b in range(cfg.stage_blocks[stage]):
            s = stage_stride if b == 0 else 1
            y, _ = _block_forward(
                y, variables[layer][str(b)], cfg, s,
                train=False, axis_name=None, policy=policy,
            )
        taps[layer] = np.asarray(y, np.float32)
    feats = lax_ops.global_avg_pool(y)
    logits = lax_ops.linear(
        feats.astype(policy.compute),
        variables["fc"]["weight"].astype(policy.compute),
        variables["fc"]["bias"],
    )
    taps["logits"] = np.asarray(logits, np.float32)

    # Torch taps at the same boundaries.
    twin.eval()
    ref: dict[str, np.ndarray] = {}
    with torch.no_grad():
        t = torch.from_numpy(np.asarray(x_nchw, np.float32))
        t = twin.maxpool(twin.relu(twin.bn1(twin.conv1(t))))
        ref["stem"] = t.numpy().transpose(0, 2, 3, 1)
        for stage in range(4):
            t = getattr(twin, f"layer{stage + 1}")(t)
            ref[f"layer{stage + 1}"] = t.numpy().transpose(0, 2, 3, 1)
        out = twin.fc(torch.flatten(twin.avgpool(t), 1))
        ref["logits"] = out.numpy()

    report = {}
    for name in taps:
        err = np.abs(taps[name] - ref[name])
        report[name] = {"mae": float(err.mean()), "max": float(err.max())}
    return report
