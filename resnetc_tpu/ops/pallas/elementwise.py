"""Standalone elementwise Pallas kernels: relu, residual add, add+relu.

Completes the reference's kernel inventory op-for-op (reluForwardKernel
cuda/ops.cu:130-137, addForwardKernel cuda/ops.cu:153-160).  On the real
serving path these are fused into GEMM/conv epilogues (gemm.py, block.py) —
the standalone kernels exist for composability and for workloads that need
them unfused; each is a single VPU pass over 2-D row tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tiles(n_rows: int, n_cols: int) -> tuple[int, int]:
    tr = min(1024, _round_up(n_rows, 8))
    tc = min(512, _round_up(n_cols, 128))
    return tr, tc


def _unary_call(kernel, x, *, interpret):
    """Run an elementwise kernel over a flattened-2D view of x."""
    shape = x.shape
    n = x.size
    # Fold to (rows, 128k) 2-D; pad the tail.
    cols = 512 if n >= 512 else _round_up(n, 128)
    rows = -(-n // cols)
    pad = rows * cols - n
    x2 = jnp.pad(x.reshape(-1), (0, pad)).reshape(rows, cols)
    tr, tc = _tiles(rows, cols)
    rp = _round_up(rows, tr)
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(rp // tr, cols // tc),
        in_specs=[pl.BlockSpec((tr, tc), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rp, cols), x.dtype),
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n].reshape(shape)


def _binary_call(kernel, a, b, *, interpret):
    assert a.shape == b.shape, (a.shape, b.shape)
    shape = a.shape
    n = a.size
    cols = 512 if n >= 512 else _round_up(n, 128)
    rows = -(-n // cols)
    pad = rows * cols - n
    a2 = jnp.pad(a.reshape(-1), (0, pad)).reshape(rows, cols)
    b2 = jnp.pad(b.reshape(-1), (0, pad)).reshape(rows, cols)
    tr, tc = _tiles(rows, cols)
    rp = _round_up(rows, tr)
    if rp != rows:
        a2 = jnp.pad(a2, ((0, rp - rows), (0, 0)))
        b2 = jnp.pad(b2, ((0, rp - rows), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(rp // tr, cols // tc),
        in_specs=[
            pl.BlockSpec((tr, tc), lambda i, j: (i, j)),
            pl.BlockSpec((tr, tc), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rp, cols), a.dtype),
        interpret=interpret,
    )(a2, b2)
    return out.reshape(-1)[:n].reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def relu(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """max(x, 0) — reference reluForwardKernel (cuda/ops.cu:130-137)."""

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.maximum(x_ref[:], jnp.zeros((), o_ref.dtype))

    return _unary_call(kernel, x, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add(a: jax.Array, b: jax.Array, *, interpret: bool = False) -> jax.Array:
    """a + b — reference addForwardKernel (cuda/ops.cu:153-160)."""

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:] + b_ref[:]

    return _binary_call(kernel, a, b, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add_relu(a: jax.Array, b: jax.Array, *, interpret: bool = False) -> jax.Array:
    """relu(a + b) — the residual join, one VPU pass instead of two."""

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.maximum(a_ref[:] + b_ref[:], jnp.zeros((), o_ref.dtype))

    return _binary_call(kernel, a, b, interpret=interpret)
