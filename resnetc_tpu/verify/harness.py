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
from resnetc_tpu.models.resnet import ResNetConfig, forward
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
