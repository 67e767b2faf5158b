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


def _pool_tap_kernel(x_ref, o_ref, *, k, stride, oh, ow):
    """One kernel ROW of taps (kh) per grid step; the output block is
    revisited across the k steps and max-accumulated in VMEM.

    Keeping kh in the grid bounds scoped VMEM to the s same-row phase planes
    + the output block: the fully-unrolled version loaded the whole
    (s*s, hq, wq, tc) plane stack per step, which blows the 16MB scoped-VMEM
    limit at the stem pool's 112x112 shape (caught by tools/verify_tpu.py —
    interpret mode can't see compiled-path VMEM budgets).  kw stays unrolled
    in the body because its offset lands on the SUBLANE dim, where Mosaic
    only allows dynamic starts it can prove 8-aligned; the dynamic kh offset
    lands on the untiled H dim, which is unrestricted.
    """
    kh = pl.program_id(2)
    qh = kh // stride
    cur = None
    for kw in range(k):
        pw, qw = kw % stride, kw // stride
        sl = x_ref[pw, :, pl.ds(qh, oh), qw : qw + ow, :].astype(o_ref.dtype)
        cur = sl if cur is None else jnp.maximum(cur, sl)

    @pl.when(kh == 0)
    def _first():
        o_ref[:] = cur

    @pl.when(kh > 0)
    def _rest():
        o_ref[:] = jnp.maximum(o_ref[:], cur)


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
    # Footprint at the doubled bt, with the sublane dims (wq, ow) padded to 8
    # as Mosaic lays them out; budget leaves room for double buffering +
    # kernel temporaries inside the 16MB scoped-VMEM limit.
    wq8, ow8 = _round_up(wq, 8), _round_up(ow, 8)
    while (
        bt < b
        and b % (2 * bt) == 0
        and 2 * bt * (s * hq * wq8 + oh * ow8) * tc * itemsize <= 3500 * 2**10
    ):
        bt *= 2

    out = pl.pallas_call(
        functools.partial(_pool_tap_kernel, k=k, stride=s, oh=oh, ow=ow),
        grid=(b // bt, cp // tc, k),
        in_specs=[
            # Block = the s same-kh phase planes (pw = 0..s-1); plane index
            # ph*s+pw makes them contiguous, so block index kh%s selects them.
            pl.BlockSpec(
                (s, bt, hq, wq, tc), lambda i, j, kh: (kh % s, i, 0, 0, j)
            )
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, tc), lambda i, j, kh: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(planes)
    return out[..., :c] if cp != c else out


def _avg_tap_kernel(x_ref, o_ref, acc_ref, *, k, stride, oh, ow, divisor):
    """Tap-row-per-grid-step average pool (same scoped-VMEM / alignment
    structure as _pool_tap_kernel) with an fp32 scratch accumulator; the
    quotient is written once, on the final kh step."""
    kh = pl.program_id(2)
    qh = kh // stride
    cur = None
    for kw in range(k):
        pw, qw = kw % stride, kw // stride
        sl = x_ref[pw, :, pl.ds(qh, oh), qw : qw + ow, :].astype(jnp.float32)
        cur = sl if cur is None else cur + sl

    @pl.when(kh == 0)
    def _first():
        acc_ref[:] = cur

    @pl.when(kh > 0)
    def _rest():
        acc_ref[:] = acc_ref[:] + cur

    @pl.when(kh == k - 1)
    def _emit():
        o_ref[:] = (acc_ref[:] * (1.0 / divisor)).astype(o_ref.dtype)


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
    wq8, ow8 = _round_up(wq, 8), _round_up(ow, 8)
    while (
        bt < b and b % (2 * bt) == 0
        and 2 * bt * (s * hq * wq8 + 2 * oh * ow8) * tc * itemsize <= 3500 * 2**10
    ):
        bt *= 2

    out = pl.pallas_call(
        functools.partial(
            _avg_tap_kernel, k=k, stride=s, oh=oh, ow=ow, divisor=k * k
        ),
        grid=(b // bt, cp // tc, k),
        in_specs=[
            pl.BlockSpec(
                (s, bt, hq, wq, tc), lambda i, j, kh: (kh % s, i, 0, 0, j)
            )
        ],
        out_specs=pl.BlockSpec((bt, oh, ow, tc), lambda i, j, kh: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cp), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, oh, ow, tc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(planes)
    return out[..., :c] if cp != c else out
