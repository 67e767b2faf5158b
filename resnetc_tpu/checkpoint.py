"""Checkpoint I/O: the reference's raw-f32 format, torch interop, and Orbax.

The reference's "checkpoint system" is one headerless little-endian float32
file per parameter, named exactly by its PyTorch ``state_dict()`` key, in a
flat directory (save_weights.py:8-12; consumed by loadWeightToCuda at
cuda/nn.cuh:21, :58-61 with shapes supplied by the caller).  This module
reads and writes that exact format, so weights exported for the CUDA engine
load here unchanged — but instead of ~467 serialized per-file H2D copies with
two device syncs each (SURVEY.md §3.1), we assemble the whole pytree on host
and ``jax.device_put`` it once.

Layout contract: on disk / in torch, conv weights are OIHW and activations
NCHW (the PyTorch world); in this framework conv weights are HWIO and
activations NHWC.  All conversions happen here, at the boundary.

For training we additionally provide Orbax-backed save/restore of the full
train state (step, params, BN stats, momentum) — new surface, the reference
has no training and therefore no resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models.resnet import ResNetConfig, init

Pytree = Any

# state_dict keys the reference exporter writes but the engine ignores
# (BatchNorm bookkeeping torchvision tracks; not a tensor the math uses).
_IGNORED_KEYS = ("num_batches_tracked",)


# ---------------------------------------------------------------------------
# flat dotted-key <-> nested pytree
# ---------------------------------------------------------------------------


def flatten_tree(tree: Pytree, prefix: str = "") -> dict[str, Any]:
    """Nested dict -> {'layer1.0.conv1.weight': leaf, ...} (torchvision keys)."""
    out: dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, prefix=f"{key}."))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Mapping[str, Any]) -> Pytree:
    out: dict[str, Any] = {}
    for key, v in flat.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def param_shapes(cfg: ResNetConfig) -> dict[str, tuple[int, ...]]:
    """Framework-layout (HWIO) shape for every flat key, computed without
    materialising any arrays."""
    shapes_tree = jax.eval_shape(lambda: init(cfg, jax.random.key(0)))
    return {k: tuple(v.shape) for k, v in flatten_tree(shapes_tree).items()}


def _is_conv_weight(key: str, shape: tuple[int, ...]) -> bool:
    # Conv weights are the only rank-4 tensors in a ResNet state dict.
    return key.endswith("weight") and len(shape) == 4


# ---------------------------------------------------------------------------
# Reference raw-f32 format
# ---------------------------------------------------------------------------


def save_reference_format(variables: Pytree, directory: str | os.PathLike) -> int:
    """Write a variables tree as the reference's weight files.

    One raw little-endian float32 file per parameter, file name = torchvision
    state_dict key, conv weights converted HWIO -> OIHW so the bytes are
    identical to save_weights.py output.  Returns the number of files written.
    """
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    flat = flatten_tree(variables)
    for key, leaf in flat.items():
        arr = np.asarray(leaf, dtype=np.float32)
        if _is_conv_weight(key, arr.shape):
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        arr.astype("<f4").tofile(directory / key)
    return len(flat)


def load_reference_format(
    cfg: ResNetConfig,
    directory: str | os.PathLike,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> Pytree:
    """Load the reference's weight-file directory into a variables pytree.

    Shapes are supplied by the model config (the files are headerless — the
    reference likewise has the caller supply shapes via ``view``,
    cuda/tensor.cuh:134-142 + nn.cuh:21-22).  Element-count mismatches raise,
    replacing the reference's silent flat load + abort-on-view.
    """
    directory = Path(directory)
    shapes = param_shapes(cfg)
    for key, shape in shapes.items():
        if not (directory / key).exists():
            raise FileNotFoundError(
                f"missing weight file {directory / key} (expected shape {shape})"
            )

    # Host read: parallel native slurp when built (the reference reads its
    # ~467 files serially with two device syncs each, SURVEY.md §3.1);
    # np.fromfile fallback otherwise.
    raws: dict[str, np.ndarray]
    try:
        from resnetc_tpu import native

        if not native.available():
            raise RuntimeError
        keys = list(shapes)
        counts = [int(np.prod(shapes[k])) for k in keys]
        arrays = native.read_f32_many([str(directory / k) for k in keys], counts)
        raws = dict(zip(keys, arrays))
    except (RuntimeError, ValueError):
        raws = {k: np.fromfile(directory / k, dtype="<f4") for k in shapes}

    flat: dict[str, jax.Array] = {}
    for key, shape in shapes.items():
        path = directory / key
        raw = raws[key]
        if _is_conv_weight(key, shape):
            h, w, i, o = shape
            if raw.size != h * w * i * o:
                raise ValueError(f"{path}: {raw.size} elems, expected {h*w*i*o} for {shape}")
            arr = raw.reshape(o, i, h, w).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            if raw.size != int(np.prod(shape)):
                raise ValueError(f"{path}: {raw.size} elems, expected shape {shape}")
            arr = raw.reshape(shape)
        flat[key] = jnp.asarray(arr, dtype)
    return unflatten_tree(flat)


# ---------------------------------------------------------------------------
# torch interop (verification-time)
# ---------------------------------------------------------------------------


def variables_from_torch_state_dict(state_dict: Mapping[str, Any]) -> Pytree:
    """Convert a torch ``state_dict()`` (e.g. from the verify twin) into a
    framework variables tree (conv weights OIHW -> HWIO)."""
    flat: dict[str, jax.Array] = {}
    for key, t in state_dict.items():
        if any(key.endswith(sfx) for sfx in _IGNORED_KEYS):
            continue
        arr = np.asarray(t.detach().cpu().numpy(), dtype=np.float32)
        if _is_conv_weight(key, arr.shape):
            arr = arr.transpose(2, 3, 1, 0)
        flat[key] = jnp.asarray(arr)
    return unflatten_tree(flat)


def torch_state_dict_from_variables(variables: Pytree) -> dict[str, Any]:
    """Inverse of :func:`variables_from_torch_state_dict` (returns torch
    tensors; used to push our params into the twin for grad-checks)."""
    import torch

    flat = flatten_tree(variables)
    out: dict[str, Any] = {}
    for key, leaf in flat.items():
        arr = np.asarray(leaf, dtype=np.float32)
        if _is_conv_weight(key, arr.shape):
            arr = arr.transpose(3, 2, 0, 1)
        out[key] = torch.from_numpy(arr.copy())
    return out


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing
# ---------------------------------------------------------------------------


def save_train_state(directory: str | os.PathLike, state: Pytree) -> None:
    """Durable training checkpoint (params + BN stats + optimizer + step)."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state(directory: str | os.PathLike, like: Pytree) -> Pytree:
    """Restore a training checkpoint with the structure/shardings of ``like``."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)


def variables_from_torch_file(path: str | os.PathLike) -> Pytree:
    """Load a PyTorch checkpoint file (.pth/.pt) into a variables tree.

    Accepts a raw ``state_dict`` or a dict wrapping one under 'state_dict'/
    'model' (the common torchvision / training-loop layouts) — so a
    downloaded torchvision ``resnet152-*.pth`` imports directly, without
    torchvision installed.
    """
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and not any(hasattr(v, "detach") for v in obj.values()):
        for key in ("state_dict", "model"):
            if key in obj:
                obj = obj[key]
                break
    if not isinstance(obj, dict) or not all(
        hasattr(v, "detach") for v in obj.values()
    ):
        raise ValueError(
            f"{path}: no tensor state_dict found (top-level keys: "
            f"{sorted(obj)[:8] if isinstance(obj, dict) else type(obj).__name__}); "
            "expected a state_dict or a dict with a 'state_dict'/'model' entry"
        )
    return variables_from_torch_state_dict(obj)
