"""Device-mesh parallelism: DP over ICI, optional channel TP.

The reference has no distribution at all (single GPU, B=1 — SURVEY.md §2
checklist); its only inter-memory transfer is cudaMemcpy inside
Tensor::toDevice.  Here, scaling is the idiomatic TPU recipe: pick a
``jax.sharding.Mesh``, annotate array shardings, and let XLA insert the ICI
collectives (gradient ``psum`` for DP, per BASELINE.json config #5).
"""

from resnetc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    label_sharding,
    param_shardings,
    replicated,
)
