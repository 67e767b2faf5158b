"""Fused convolution kernels: conv + bias(+BN-fold) + residual + ReLU.

Two kernels cover ResNet's conv inventory (reference: cuda/ops.cu:14-48 runs
every shape through one scalar-per-block loop; here each shape gets the MXU
formulation it wants):

- ``conv1x1_fused`` — a 1x1 conv *is* a GEMM over (B*H*W, Cin) x (Cin, Cout);
  strided 1x1 (the downsample path) becomes a spatial slice + the same GEMM.
  Routed through the tiled epilogue-fused matmul in ``gemm.py``.

- ``conv3x3_s1_fused`` — implicit GEMM: zero-pad the input, flatten each
  image's padded rows to a (Hp*Wp, Cin) matrix, and accumulate **nine
  statically-shifted MXU passes** (one per kernel tap) into an fp32 VMEM
  accumulator:

      acc[m] += x_rows[m + kh*Wp + kw] @ W[kh, kw]     for kh, kw in 3x3

  Every shifted operand is a static contiguous slice — no gathers, no
  im2col materialisation, no halo exchange: blocks tile the *batch* axis, so
  grid blocks never overlap.  Rows landing in the padding ring compute
  garbage that is simply never stored (~2*W+6 of Hp*Wp rows, <4% waste at
  ResNet shapes).  The epilogue fuses bias (BN-fold), residual add, ReLU,
  and the bf16 cast into the same output tile.

Stride-2 3x3 convs (three per ResNet) and the 7x7 stem (~3% of FLOPs
combined) stay on the XLA conv — see ops.pallas.fused for the routing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resnetc_tpu.ops.pallas.gemm import matmul


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def conv1x1_fused(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    stride: int = 1,
    relu: bool = False,
    out_dtype: jnp.dtype | None = None,
    interpret: bool = False,
) -> jax.Array:
    """1x1 conv (+bias+residual+ReLU) as an epilogue-fused GEMM.

    x: (B, H, W, Cin) NHWC; w: (1, 1, Cin, Cout) HWIO or (Cin, Cout);
    residual: (B, OH, OW, Cout).  stride>1 slices the input grid first
    (a 1x1 conv never mixes spatial positions, so slicing == striding).
    """
    if w.ndim == 4:
        assert w.shape[:2] == (1, 1), w.shape
        w = w[0, 0]
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    res2d = residual.reshape(b * h * ww, cout) if residual is not None else None
    out = matmul(
        x.reshape(b * h * ww, cin), w, bias, res2d,
        relu=relu, out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(b, h, ww, cout)


def _pick_batch_tile(
    b: int,
    rows_per_image: int,
    cin: int,
    tn: int,
    *,
    w_block_bytes: int = 0,
    out_bufs: int = 1,
    itemsize: int = 2,
) -> int:
    """Largest divisor of B whose full Mosaic stack fits scoped VMEM.

    Per grid step the stack holds: the double-buffered input block
    (rows x cin), the widest in-kernel shifted-slice temporary, the fp32
    accumulator plus one fp32 dot temporary (rows x tn each), the
    double-buffered output block(s) (``out_bufs`` = 2 when a residual
    operand streams in alongside the output), and the double-buffered
    weight block (``w_block_bytes``).  Budgeted to 13MB of the 16MB/core
    scoped VMEM limit — the old 6MB input+acc heuristic ignored the weight
    and output blocks and Mosaic OOM'd at (256,7,7,512)+residual with
    16.22M (the resnet18 b256 L4 transition conv, 2026-08-19)."""
    budget = 13 * 2**20 - 2 * w_block_bytes
    per_row = (
        2 * cin * itemsize          # input block, double-buffered
        + cin * itemsize            # shifted-slice temporary
        + 2 * tn * 4                # fp32 accumulator + dot result
        + out_bufs * 2 * tn * itemsize  # output (+residual) blocks, dbl
    )
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if bt * rows_per_image * per_row > budget:
            break
        best = bt
    return best


def _conv3x3_kernel(x_ref, w_ref, b_ref, r_ref, o_ref, acc_ref, *,
                    bt, hp, wp, h, w_out, m_acc, relu):
    """One (batch-tile, cout-tile) grid step of the nine-shift implicit GEMM.

    x_ref is the flat (bt*hp*wp, cin) row block; each tap loads only its
    shifted slice from the ref (not the whole block) and accumulates into
    the fp32 VMEM scratch in place — peak live set is one lhs slice, one
    dot result, and the accumulator."""
    tn = w_ref.shape[-1]
    for kh in range(3):
        for kw in range(3):
            off = kh * wp + kw
            lhs = x_ref[off : off + m_acc, :]
            contrib = jnp.dot(lhs, w_ref[kh, kw], preferred_element_type=jnp.float32)
            if kh == 0 and kw == 0:
                acc_ref[:] = contrib
            else:
                acc_ref[:] += contrib
    bias = b_ref[:].astype(jnp.float32) if b_ref is not None else None
    # Scatter valid rows (the non-padding positions) to the output tile.
    for bi in range(bt):
        img = acc_ref[bi * hp * wp : bi * hp * wp + h * wp, :]
        img = img.reshape(h, wp, tn)[:, :w_out, :]
        if bias is not None:
            img = img + bias
        if r_ref is not None:
            img = img + r_ref[bi].astype(jnp.float32)
        if relu:
            img = jnp.maximum(img, 0.0)
        o_ref[bi] = img.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "out_dtype", "tn", "bt", "interpret")
)
def conv3x3_s1_fused(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    relu: bool = False,
    out_dtype: jnp.dtype | None = None,
    tn: int | None = None,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3x3 stride-1 pad-1 conv: ``relu(conv(x, w) + bias + residual)``.

    x: (B, H, W, Cin) NHWC; w: (3, 3, Cin, Cout) HWIO; bias: (Cout,);
    residual: (B, H, W, Cout). Output: (B, H, W, Cout) in ``out_dtype``
    (default x.dtype); accumulation fp32.
    """
    b, h, w_sp, cin = x.shape
    assert w.shape[:3] == (3, 3, cin), (w.shape, x.shape)
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    tn = tn or min(256, _round_up(cout, 128))

    coutp = _round_up(cout, tn)
    if coutp != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, coutp - cout)))
        if bias is not None:
            bias = jnp.pad(bias, (0, coutp - cout))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0),) * 3 + ((0, coutp - cout),))

    wp = w_sp + 2
    bt = bt or _pick_batch_tile(
        b, (h + 2) * wp, cin, tn,
        w_block_bytes=9 * cin * tn * x.dtype.itemsize,
        out_bufs=2 if residual is not None else 1,
        itemsize=x.dtype.itemsize,
    )

    # Rows needed by the furthest shift (kh=kw=2) plus store slack; grow the
    # bottom zero-padding until the padded image grid covers them.
    # Grow bottom padding until the furthest shifted slice fits AND the
    # row-block size is sublane-aligned (Mosaic: second-to-last block dim
    # must be divisible by 8).
    extra = 0
    while True:
        hp = h + 2 + extra
        rows_per_image = hp * wp
        m_acc = _round_up((bt - 1) * rows_per_image + h * wp, 128)
        if m_acc + 2 * wp + 2 <= bt * rows_per_image and (bt * rows_per_image) % 8 == 0:
            break
        extra += 1

    x_pad = jnp.pad(x, ((0, 0), (1, 1 + extra), (1, 1), (0, 0)))
    x_rows = x_pad.reshape(b * hp * wp, cin)

    grid = (b // bt, coutp // tn)
    in_specs = [
        pl.BlockSpec((bt * hp * wp, cin), lambda i, j: (i, 0)),
        pl.BlockSpec((3, 3, cin, tn), lambda i, j: (0, 0, 0, j)),
    ]
    operands = [x_rows, w]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j: (0, j)))
        operands.append(bias[None, :])
    if residual is not None:
        in_specs.append(pl.BlockSpec((bt, h, w_sp, tn), lambda i, j: (i, 0, 0, j)))
        operands.append(residual)

    def kernel(*refs):
        idx = 2
        b_ref = refs[idx] if bias is not None else None
        idx += bias is not None
        r_ref = refs[idx] if residual is not None else None
        idx += residual is not None
        o_ref, acc_ref = refs[idx], refs[idx + 1]
        _conv3x3_kernel(
            refs[0], refs[1], b_ref, r_ref, o_ref, acc_ref,
            bt=bt, hp=hp, wp=wp, h=h, w_out=w_sp, m_acc=m_acc, relu=relu,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, h, w_sp, tn), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, h, w_sp, coutp), out_dtype),
        scratch_shapes=[pltpu.VMEM((m_acc, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_sp * 9 * cin * coutp,
            bytes_accessed=(b * hp * wp * cin + 9 * cin * coutp + b * h * w_sp * coutp) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if coutp != cout:
        out = out[..., :cout]
    return out


def _conv_s2_kernel(p_ref, w_ref, b_ref, o_ref, acc_ref, *,
                    k, bt, hq, wq, oh, ow, m_acc, relu):
    """Stride-2 odd-k conv via phase planes: tap (u, v) reads plane
    (u%2, v%2) at the stride-1 offset (u//2)*wq + (v//2) — the shifted-slice
    implicit GEMM fanned over four planes (k*k taps)."""
    tn = w_ref.shape[-1]
    first = True
    for u in range(k):
        for v in range(k):
            phase = (u % 2) * 2 + (v % 2)
            off = (u // 2) * wq + (v // 2)
            lhs = p_ref[phase, off : off + m_acc, :]
            contrib = jnp.dot(lhs, w_ref[u, v], preferred_element_type=jnp.float32)
            if first:
                acc_ref[:] = contrib
                first = False
            else:
                acc_ref[:] += contrib
    bias = b_ref[:].astype(jnp.float32) if b_ref is not None else None
    for bi in range(bt):
        img = acc_ref[bi * hq * wq : bi * hq * wq + oh * wq, :]
        img = img.reshape(oh, wq, tn)[:, :ow, :]
        if bias is not None:
            img = img + bias
        if relu:
            img = jnp.maximum(img, 0.0)
        o_ref[bi] = img.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "out_dtype", "tn", "bt", "interpret")
)
def conv_s2_fused(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    *,
    relu: bool = False,
    out_dtype: jnp.dtype | None = None,
    tn: int | None = None,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused odd-k stride-2 pad-k//2 conv: ``relu(conv(x, w) + bias)``.

    Covers ResNet's stage-transition 3x3 convs (k=5/7 also verified against
    the oracle).  out(r, c) sums x_pad[2r+u, 2c+v] @ W[u, v]; splitting
    x_pad into its 2x2 interleaved phase planes turns every tap into a
    stride-1 slice (Mosaic has no strided vector access), reusing the
    implicit-GEMM row layout of the stride-1 kernel per plane.

    The 7x7 RGB stem stays on XLA: with cin=3 every tap temporary gets
    lane-padded 3 -> 128 in vregs, blowing VMEM ~40x (measured 33MB at
    224x224x3) — an image-layout special case XLA's conv emitter handles
    natively and that is ~3% of network FLOPs.
    """
    b, h, w_sp, cin = x.shape
    k = w.shape[0]
    assert w.shape[:3] == (k, k, cin) and k % 2 == 1, (w.shape, x.shape)
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    # Lane dim may be < 128 only when it equals the full array dim — so for
    # narrow couts (the 64-wide stem) use cout itself instead of padding to
    # 128 and doubling the VMEM footprint.
    tn = tn or (cout if cout < 128 else min(256, _round_up(cout, 128)))
    pad = k // 2

    oh = (h + 2 * pad - k) // 2 + 1
    ow = (w_sp + 2 * pad - k) // 2 + 1

    coutp = _round_up(cout, tn)
    if coutp != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, coutp - cout)))
        if bias is not None:
            bias = jnp.pad(bias, (0, coutp - cout))

    # Plane geometry: planes need >= ow + ceil(pad/2) columns and enough
    # rows for the furthest shift; wq rounded to 8 sublanes so the u-shifts
    # (multiples of wq) stay aligned.
    max_off = (k - 1) // 2  # largest u//2 (and v//2) plane offset
    wq = _round_up(ow + max_off, 8)
    bt = bt or _pick_batch_tile(
        b, (oh + max_off) * wq, 4 * cin, tn,
        w_block_bytes=k * k * cin * tn * x.dtype.itemsize,
        itemsize=x.dtype.itemsize,
    )
    extra = 0
    while True:
        hq = oh + max_off + extra
        m_acc = _round_up((bt - 1) * hq * wq + oh * wq, 128)
        if m_acc + max_off * wq + max_off <= bt * hq * wq:
            break
        extra += 1

    # Pad x so every phase plane is exactly (hq, wq): plane (ph, pw) reads
    # x_pad rows 2i+ph (i < hq) and cols 2j+pw (j < wq).
    x_pad = jnp.pad(
        x,
        ((0, 0), (pad, 2 * hq - 1 - h - (pad - 1)), (pad, 2 * wq - 1 - w_sp - (pad - 1)), (0, 0)),
    )
    planes = jnp.stack(
        [x_pad[:, ph::2, pw::2, :] for ph in range(2) for pw in range(2)]
    )  # (4, B, hq, wq, cin)
    planes = planes.reshape(4, b * hq * wq, cin)

    grid = (b // bt, coutp // tn)
    in_specs = [
        pl.BlockSpec((4, bt * hq * wq, cin), lambda i, j: (0, i, 0)),
        pl.BlockSpec((k, k, cin, tn), lambda i, j: (0, 0, 0, j)),
    ]
    operands = [planes, w]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j: (0, j)))
        operands.append(bias[None, :])

    def kernel(*refs):
        b_ref = refs[2] if bias is not None else None
        o_ref = refs[2 + (bias is not None)]
        acc_ref = refs[3 + (bias is not None)]
        _conv_s2_kernel(
            refs[0], refs[1], b_ref, o_ref, acc_ref,
            k=k, bt=bt, hq=hq, wq=wq, oh=oh, ow=ow, m_acc=m_acc, relu=relu,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, oh, ow, tn), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, coutp), out_dtype),
        scratch_shapes=[pltpu.VMEM((m_acc, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * oh * ow * k * k * cin * coutp,
            bytes_accessed=(4 * b * hq * wq * cin + k * k * cin * coutp + b * oh * ow * coutp) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if coutp != cout:
        out = out[..., :cout]
    return out


def conv3x3_s2_fused(x, w, bias=None, *, relu=False, out_dtype=None, tn=None,
                     bt=None, interpret=False):
    """3x3 stride-2 pad-1 conv — thin alias over the generic odd-k kernel."""
    return conv_s2_fused(
        x, w, bias, relu=relu, out_dtype=out_dtype, tn=tn, bt=bt,
        interpret=interpret,
    )
