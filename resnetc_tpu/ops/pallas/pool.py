"""Pallas max-pool kernel (NHWC).

The reference's maxPool2dKernel walks the window with one scalar thread per
output element (cuda/ops.cu:50-78).  Here the strided window max is computed
via **phase-plane decomposition**: the padded input is split into its
stride*stride interleaved planes (``x[:, ph::s, pw::s, :]`` — one cheap XLA
relayout), after which every kernel tap (kh, kw) is a *stride-1* static
slice of plane ``(kh % s, kw % s)`` at offset ``(kh // s, kw // s)``:

    out[r, c] = max over (kh, kw) of plane[kh%s, kw%s][r + kh//s, c + kw//s]

Mosaic only supports unit-stride vector slices, so this turns a
hardware-unfriendly strided gather into vectorised elementwise maxes over
the channel lanes.  Padding ring is -inf (reference semantics,
cuda/ops.cu:64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pool_kernel(x_ref, o_ref, *, k, stride, oh, ow):
    # x_ref: (s*s phases, bt, hq, wq, tc); o_ref: (bt, oh, ow, tc)
    acc = None
    for kh in range(k):
        for kw in range(k):
            phase = (kh % stride) * stride + (kw % stride)
            qh, qw = kh // stride, kw // stride
            sl = x_ref[phase, :, qh : qh + oh, qw : qw + ow, :]
            acc = sl if acc is None else jnp.maximum(acc, sl)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "stride", "padding", "interpret")
)
def max_pool2d(
    x: jax.Array,
    *,
    kernel_size: int,
    stride: int,
    padding: int,
    interpret: bool = False,
) -> jax.Array:
    """Max pool, NHWC; -inf padding (reference cuda/ops.cu:64)."""
    b, h, w, c = x.shape
    k, s = kernel_size, stride
    oh = (h + 2 * padding - k) // s + 1
    ow = (w + 2 * padding - k) // s + 1

    neg = (
        jnp.asarray(-jnp.inf, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    # Pad: pool ring, plus bottom/right so each phase plane has
    # >= (k//s + oh) rows — every kernel-tap slice stays in bounds.
    need_h = s * (k // s + oh)
    need_w = s * (k // s + ow)
    x_pad = jnp.pad(
        x,
        (
            (0, 0),
            (padding, max(need_h - h - padding, 0)),
            (padding, max(need_w - w - padding, 0)),
            (0, 0),
        ),
        constant_values=neg,
    )
    hp, wp = x_pad.shape[1], x_pad.shape[2]
    hq, wq = hp // s, wp // s

    # Phase planes: (s*s, B, hq, wq, C).
    planes = jnp.stack(
        [x_pad[:, ph::s, pw::s, :] for ph in range(s) for pw in range(s)]
    )

    tc = min(128, _round_up(c, 128))
    cp = _round_up(c, tc)
    if cp != c:
        planes = jnp.pad(
            planes, ((0, 0),) * 4 + ((0, cp - c),), constant_values=neg
        )

    bt = 1
    itemsize = jnp.dtype(x.dtype).itemsize
    while (
        bt < b
        and b % (2 * bt) == 0
        and 2 * bt * s * s * hq * wq * tc * itemsize <= 4 * 2**20
    ):
        bt *= 2

    out = pl.pallas_call(
        functools.partial(_pool_kernel, k=k, stride=s, oh=oh, ow=ow),
        grid=(b // bt, cp // tc),
        in_specs=[
            pl.BlockSpec((s * s, bt, hq, wq, tc), lambda i, j: (0, i, 0, 0, j))
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, tc), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(planes)
    return out[..., :c] if cp != c else out


def _avg_pool_kernel(x_ref, o_ref, *, k, stride, oh, ow, divisor):
    acc = None
    for kh in range(k):
        for kw in range(k):
            phase = (kh % stride) * stride + (kw % stride)
            qh, qw = kh // stride, kw // stride
            sl = x_ref[phase, :, qh : qh + oh, qw : qw + ow, :].astype(jnp.float32)
            acc = sl if acc is None else acc + sl
    o_ref[:] = (acc * (1.0 / divisor)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "stride", "padding", "interpret")
)
def avg_pool2d(
    x: jax.Array,
    *,
    kernel_size: int,
    stride: int,
    padding: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Average pool, NHWC, divisor always kernel_size**2 (count_include_pad
    semantics — reference cuda/ops.cu:107).  Same phase-plane structure as
    max_pool2d; padding contributes zeros to the sum."""
    b, h, w, c = x.shape
    k, s = kernel_size, stride
    oh = (h + 2 * padding - k) // s + 1
    ow = (w + 2 * padding - k) // s + 1

    need_h = s * (k // s + oh)
    need_w = s * (k // s + ow)
    x_pad = jnp.pad(
        x,
        (
            (0, 0),
            (padding, max(need_h - h - padding, 0)),
            (padding, max(need_w - w - padding, 0)),
            (0, 0),
        ),
    )
    hq, wq = x_pad.shape[1] // s, x_pad.shape[2] // s
    planes = jnp.stack(
        [x_pad[:, ph::s, pw::s, :] for ph in range(s) for pw in range(s)]
    )

    tc = min(128, _round_up(c, 128))
    cp = _round_up(c, tc)
    if cp != c:
        planes = jnp.pad(planes, ((0, 0),) * 4 + ((0, cp - c),))

    bt = 1
    itemsize = jnp.dtype(x.dtype).itemsize
    while (
        bt < b and b % (2 * bt) == 0
        and 2 * bt * s * s * hq * wq * tc * itemsize <= 4 * 2**20
    ):
        bt *= 2

    out = pl.pallas_call(
        functools.partial(
            _avg_pool_kernel, k=k, stride=s, oh=oh, ow=ow, divisor=k * k
        ),
        grid=(b // bt, cp // tc),
        in_specs=[
            pl.BlockSpec((s * s, bt, hq, wq, tc), lambda i, j: (0, i, 0, 0, j))
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, tc), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(planes)
    return out[..., :c] if cp != c else out
