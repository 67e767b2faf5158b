"""Pallas/Mosaic TPU kernels — the hand-tuned MXU path.

TPU-native analogs of the reference's seven CUDA kernels (cuda/ops.cu),
rebuilt around the hardware instead of translated: where the reference runs
one scalar thread per output element (1/32 warp utilisation, nn.cu:9), these
kernels tile work onto the 128x128 MXU with fp32 VMEM accumulators and fuse
the whole conv+BN+ReLU(+residual) epilogue into the matmul's output tile —
one HBM round trip where the reference makes four.

Kernel inventory:

- ``gemm``  — tiled matmul with fused bias/residual/ReLU epilogue; backs the
  1x1 convs (the FLOPs majority in bottleneck ResNets), the fc layer, and
  strided 1x1 downsamples.
- ``conv``  — fused 3x3 stride-1 conv+bias+ReLU as nine shifted MXU passes
  over padded rows (implicit GEMM).
- ``pool``  — max pool over NHWC tiles.
- ``fused`` — whole-model forward that routes each op to the best backend
  (Pallas kernel or XLA) per shape.

Every kernel is golden-tested against its lax oracle
(resnetc_tpu.ops.lax_ops) — in interpret mode on CPU, compiled on TPU.
"""

from resnetc_tpu.ops.pallas.gemm import matmul  # noqa: F401
from resnetc_tpu.ops.pallas.conv import (  # noqa: F401
    conv1x1_fused,
    conv3x3_s1_fused,
    conv3x3_s2_fused,
)
from resnetc_tpu.ops.pallas.pool import avg_pool2d, max_pool2d  # noqa: F401
from resnetc_tpu.ops.pallas.elementwise import add, add_relu, relu  # noqa: F401
from resnetc_tpu.ops.pallas.block import bottleneck_block_fused  # noqa: F401
from resnetc_tpu.ops.pallas.fused import fused_forward  # noqa: F401
