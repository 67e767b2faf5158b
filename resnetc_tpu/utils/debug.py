"""Debugging aids: NaN trapping, kernel interpret mode, numeric dumps.

The reference debugs by brute force: a device sync + error check after every
launch (cuda/nn.cu:14 et al.), a -DDEBUG alloc counter, and a manual
dump/breakpoint loop (SURVEY.md §5).  TPU-native equivalents:

- data races can't happen (XLA dataflow semantics), so there is no sanitizer
  to run — the analog of compute-sanitizer is Pallas interpret mode, which
  executes kernels step-by-step on CPU with python-level introspection;
- ``nan_debug()`` turns on jax_debug_nans (the analog of a CUDA error check
  after every op: any op producing NaN raises at the op, eagerly);
- ``dump_activation`` is the Tensor::save analog for the parity workflow.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import numpy as np


@contextlib.contextmanager
def nan_debug():
    """Raise at the first op that produces a NaN (disables async dispatch
    fusion benefits — debugging only)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def interpret_kernels():
    """Run all Pallas kernels interpreted (CPU, python-level) for debugging."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def dump_activation(x, path: str, *, layout: str = "NHWC") -> None:
    """Write an activation as the reference's raw-f32 dump format
    (Tensor::save, cuda/tensor.cuh:154-163) so check_out-style comparison
    tools can read it.  The file is always NCHW (the reference world's
    layout); pass layout="NCHW" if x already is."""
    arr = np.asarray(x, dtype=np.float32)
    if arr.ndim == 4 and layout == "NHWC":
        arr = arr.transpose(0, 3, 1, 2)
    elif layout not in ("NHWC", "NCHW"):
        raise ValueError(f"layout must be 'NHWC' or 'NCHW', got {layout!r}")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    arr.astype("<f4").tofile(path)


def load_activation(path: str, shape: tuple[int, ...]) -> np.ndarray:
    """Read a raw-f32 dump (ours or the reference's) with a caller-supplied
    shape — the same headerless contract as the weight files."""
    raw = np.fromfile(path, dtype="<f4")
    expected = int(np.prod(shape))
    if raw.size != expected:
        raise ValueError(f"{path}: {raw.size} elems, expected {expected} for {shape}")
    return raw.reshape(shape)
