"""Operator layer: shape math, XLA oracle ops, Pallas TPU kernels.

The XLA ops in ``lax_ops`` are the numerical ground truth (and the fallback
backend); the Pallas kernels in ``ops.pallas`` are the hand-tuned MXU path.
Both implement the same op contract, so every Pallas kernel is golden-tested
against its lax oracle (replacing the reference's eyeball tests in
cuda/test.cu, which had no assertions and no main()).
"""

from resnetc_tpu.ops.shapes import conv_output_size, pool_output_size  # noqa: F401
