"""Numeric-parity verification harness.

Automates the reference's manual workflow (pytorch_inference.py:8-11: dump a
tensor from the engine, ``torch.allclose`` it against the PyTorch twin, then
``breakpoint()``) into assertable comparisons: per-op golden checks,
layer-by-layer activation taps, end-to-end logit MAE and argmax agreement.

torch is only imported here (CPU, verification-time) — never on the TPU
compute path.
"""

from resnetc_tpu.verify.harness import (  # noqa: F401
    compare_logits,
    logit_report,
    stage_parity_report,
)
