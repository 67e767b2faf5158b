"""Array conventions and dtype policy.

TPU-native replacement for the reference's tensor layer (cuda/tensor.cuh):
where the reference hand-rolls a ref-counted ``Tensor<float>`` with explicit
``toDevice`` copies and NCHW layout, this framework standardises on

- **NHWC activations** — the TPU-preferred conv layout: C is the fastest
  axis, so channel tiles map directly onto the 128-wide VPU lanes / MXU
  columns without transposes.
- **HWIO conv weights** (torchvision stores OIHW; the checkpoint importer
  transposes on load).
- **a dtype policy**: parameters kept in fp32, compute in bf16 (MXU native)
  with fp32 accumulation, outputs in fp32.  The reference is fp32 end-to-end
  (cuda/tensor.cuh:247); our parity harness therefore has an fp32 mode to
  separate dtype error from real bugs (SURVEY.md §7 "hard parts").

Device movement is ``jax.device_put`` with an optional ``Sharding`` — the
analog of the reference's ``Tensor::toDevice`` (cuda/tensor.cuh:184-199),
minus the two device-wide syncs per copy.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Pytree = Any


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """What dtype each class of array uses.

    ``compute`` is applied to activations and weights at op boundaries;
    accumulation inside matmuls/convs is always fp32
    (``preferred_element_type``), never the compute dtype.
    """

    param: jnp.dtype = jnp.float32
    compute: jnp.dtype = jnp.bfloat16
    output: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree: Pytree) -> Pytree:
        return jax.tree.map(lambda a: a.astype(self.compute), tree)

    def cast_to_output(self, tree: Pytree) -> Pytree:
        return jax.tree.map(lambda a: a.astype(self.output), tree)


#: fp32 everywhere — matches the reference exactly; used by the parity harness.
FP32 = DtypePolicy(param=jnp.float32, compute=jnp.float32, output=jnp.float32)

#: bf16 compute / fp32 accumulate — the TPU serving + training default.
BF16 = DtypePolicy(param=jnp.float32, compute=jnp.bfloat16, output=jnp.float32)


def policy(name: str) -> DtypePolicy:
    """Look up a policy by name ('fp32' | 'bf16')."""
    try:
        return {"fp32": FP32, "bf16": BF16}[name]
    except KeyError:
        raise ValueError(f"unknown dtype policy {name!r}; expected 'fp32' or 'bf16'")


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    """Layout shim at the PyTorch-world boundary (inputs arrive NCHW,
    e.g. the reference's test_bins/*.bin are flat NCHW, main.cu:236-237)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


def oihw_to_hwio(w: jax.Array) -> jax.Array:
    """Conv-weight layout shim: PyTorch state_dict OIHW -> TPU HWIO."""
    return jnp.transpose(w, (2, 3, 1, 0))


def hwio_to_oihw(w: jax.Array) -> jax.Array:
    return jnp.transpose(w, (3, 2, 0, 1))
