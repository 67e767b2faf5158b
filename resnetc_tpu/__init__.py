"""resnetc_tpu — a TPU-native image-classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ``olehskip/resnet.c``
(a from-scratch CUDA ResNet-152 inference engine, mounted read-only at
/root/reference).  Nothing here is a translation of the CUDA code: the
reference's hand-rolled ref-counted ``Tensor<float>`` container
(cuda/tensor.cuh) becomes NHWC ``jax.Array``s with sharding annotations; its
seven naive one-thread-per-block forward kernels (cuda/ops.cu) become a single
jit-compiled XLA program plus hand-tuned Pallas/Mosaic MXU kernels; its
per-parameter raw-float32 weight files (save_weights.py) are read by a native
checkpoint importer into a parameter pytree; and its manual PyTorch
layer-parity workflow (pytorch_inference.py:8-11) is an automated verification
harness.

Layout of the package (mirrors SURVEY.md §7):

- ``ops``       — shape math, XLA oracle ops, and Pallas TPU kernels
- ``models``    — declarative ResNet family (18/34/50/101/152)
- ``checkpoint``— reference-format (raw f32 file per param) import/export
- ``data``      — JPEG ingest: decode, resize, center-crop, normalize
- ``parallel``  — device mesh + sharding rules (DP over ICI, optional TP)
- ``train``     — forward+backward training step, SGD w/ momentum
- ``serve``     — batched inference / latency benchmarking path
- ``verify``    — numeric-parity harness vs a pure-PyTorch twin
"""

__version__ = "0.1.0"

from resnetc_tpu.ops.shapes import conv_output_size  # noqa: F401
