"""Mesh + sharding rules.

Axes:

- ``data``  — data parallelism: the batch dim of activations is sharded here;
  params are replicated across it; XLA turns the gradient sum into a psum
  over ICI (BASELINE.json config #5: ResNet-50 DP on a v5e-8 mesh).
- ``model`` — optional tensor parallelism over channels: conv output channels
  and the fc output dim shard here (the natural pjit extension noted in
  SURVEY.md §2).  With ``model=1`` (the default) every rule degenerates to
  replication, so the same code path serves pure DP.

Testable without hardware: an 8-device CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Any

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    ``n_data=None`` uses all remaining devices after the model axis.  Device
    order is kept as ``jax.devices()`` returns it — on a real slice that is
    ICI-contiguous, so both axes ride ICI, not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by model={n_model}")
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Network-input batches: batch dim over 'data', everything else
    replicated.  (The 3-channel input never shards over 'model'; internal
    activations pick up channel sharding from the params via XLA
    propagation.)"""
    return NamedSharding(mesh, P(DATA_AXIS))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple[str, ...], shape: tuple[int, ...]) -> P:
    """Sharding rule for one parameter.

    Replicated over 'data' (DP), output-channel-sharded over 'model' (TP):
    conv weights HWIO shard O; fc weight [out, in] shards out; every
    per-channel vector (BN affine/stats, fc bias) shards its only dim.
    With model=1 these all collapse to full replication.
    """
    leaf = path[-1]
    if len(shape) == 4:  # conv HWIO
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 2:  # fc [out, in]
        return P(MODEL_AXIS, None)
    if len(shape) == 1:  # bn scale/bias/stats, fc bias
        return P(MODEL_AXIS)
    return P()


def param_shardings(mesh: Mesh, tree: Pytree) -> Pytree:
    """Shardings pytree for a variables/params tree under ``mesh``.

    Channel dims not divisible by the model-axis size fall back to
    replication (e.g. the 3-channel stem input never shards).
    """
    def rule(path, leaf):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        spec = _param_spec(keys, tuple(leaf.shape))
        # Drop axes that don't divide evenly — replicate those dims instead.
        fixed = []
        for dim, axis in zip(leaf.shape, spec):
            if axis is None:
                fixed.append(None)
            else:
                fixed.append(axis if dim % mesh.shape[axis] == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(rule, tree)
