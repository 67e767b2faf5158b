"""Bottleneck-block megakernel: a whole residual block in one MXU pass.

Why: at ResNet-50 batch-256 the XLA per-conv path is HBM-bound (~46% MXU) —
every conv writes its activation to HBM and the next reads it back.  This
kernel keeps the two intermediate activations of a stride-1 bottleneck block
(reference ResnetBlock, main.cu:18-46) resident in VMEM:

    y = relu( conv1x1(relu(conv3x3(relu(conv1x1(x)·W1), W2)), W3) + x )

reading x once and writing y once — ~2.7x less HBM traffic than conv-by-conv.

Layout: the whole block computes in **padded-row space** — x is zero-padded
spatially and flattened to rows (bt*Hp*Wp, 4c) per grid step:

- GEMM 1 (1x1, 4c->c) runs over all padded rows; a constant 0/1 ring mask
  zeroes the pad rows (conv padding semantics) — no scatter;
- the 3x3 is nine shifted MXU passes over the VMEM-resident z1 rows.  Wp is
  rounded up to a multiple of 8 so the kh*Wp offsets are sublane-ALIGNED
  (free); the three kw sub-offsets are paid once by materialising three
  kw-shifted copies of z1 (2 sublane rotates total instead of 6 rotated
  loads inside the tap loop);
- GEMM 3 (1x1, c->4c) adds bias + the residual (the same padded x rows, no
  second HBM read), applies ReLU, and stores the interior rows.

Compute overhead: the pad ring is computed and discarded — ~10-25% extra
rows at ResNet-50 shapes; the HBM savings dominate wherever the per-conv
path is memory-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_bt(b: int, hp: int, wp: int, c: int, c4: int) -> int:
    """Largest divisor of B whose working set fits the VMEM budget."""
    budget = 9 * 2**20
    weights = (c4 * c + 9 * c * c + c * c4) * 2
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        rows = bt * hp * wp
        work = (
            rows * c4 * 2          # xp block (bf16)
            + 3 * rows * c * 2     # three kw-shifted z1 copies (bf16)
            + rows * c * 4         # 3x3 accumulator (fp32)
            + rows * c4 * 4        # final accumulator (fp32)
            + weights
        )
        if work > budget:
            break
        best = bt
    return best


def _block_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    o_ref, z1_ref, acc2_ref,
    *, bt, hp, wp, h, w_out, m_acc, c, c4,
):
    rows = bt * hp * wp

    # --- conv1 (1x1, 4c -> c) over all padded rows, ring zeroed by mask.
    z1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    z1 = jnp.maximum(z1 + b1_ref[:].astype(jnp.float32), 0.0)
    z1 = z1.reshape(bt, hp * wp, c) * mask_ref[:].astype(jnp.float32)
    z1 = z1.reshape(rows, c).astype(z1_ref.dtype)

    # Interleave the three kw-shifts along channels into one (rows, 3c)
    # buffer (kw=0 aligned store; kw=1/2 pay one sublane rotate each).
    # Every 3x3 "tap" below is then an ALIGNED load (offset kh*wp with
    # wp % 8 == 0) and the nine K=c dots collapse to three K=3c dots.
    usable = rows - 2
    for kw in range(3):
        z1_ref[0:usable, kw * c : (kw + 1) * c] = jax.lax.slice_in_dim(
            z1, kw, kw + usable, axis=0
        )

    # --- conv2 (3x3 s1): three aligned MXU passes, K = 3c.
    w2r = w2_ref[:].reshape(3, 3 * c, c)  # (kh, kw*c, cout)
    for kh in range(3):
        lhs = z1_ref[kh * wp : kh * wp + m_acc, :]
        contrib = jnp.dot(lhs, w2r[kh], preferred_element_type=jnp.float32)
        if kh == 0:
            acc2_ref[:] = contrib
        else:
            acc2_ref[:] += contrib
    z2 = jnp.maximum(acc2_ref[:] + b2_ref[:].astype(jnp.float32), 0.0).astype(
        z1_ref.dtype
    )

    # --- conv3 (1x1, c -> 4c) + residual + ReLU; store interior rows only.
    # Row t of z2 is padded position t + wp + 1, so the residual is the x
    # block at that offset and output row r*Wp + col maps to t = r*wp + col.
    y = jnp.dot(z2, w3_ref[:], preferred_element_type=jnp.float32)
    y = y + b3_ref[:].astype(jnp.float32)
    y = y + x_ref[wp + 1 : wp + 1 + m_acc, :].astype(jnp.float32)
    y = jnp.maximum(y, 0.0).astype(o_ref.dtype)
    for bi in range(bt):
        img = jax.lax.slice_in_dim(y, bi * hp * wp, bi * hp * wp + h * wp, axis=0)
        # Store the full padded width; the caller strips the pad columns
        # with an XLA slice (cheap, fuses into the consumer) instead of a
        # per-store sublane relayout here.
        o_ref[bi] = img.reshape(h, wp, c4)


# ---------------------------------------------------------------------------
# Chained variant: padded-row layout in AND out, so consecutive stride-1
# blocks compose with ZERO relayout between them.
# ---------------------------------------------------------------------------


def _chained_kernel(
    x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    o_ref, z1_ref,
    *, bt, hp, wp, c, c4,
):
    """One stride-1 bottleneck block over flat padded rows -> the SAME flat
    padded-row layout (ring rows carry garbage; see bottleneck_block_chained).

    Differences from _block_kernel (the pad-in/strip-out variant):

    - y is computed for ALL padded rows (t = padded position), so stores are
      aligned full-width writes — no per-image slice/reshape loop;
    - the kw-interleaved z1 buffer is laid out as z1i[u] = z1[u - (wp+1) + kw]
      so every later tap read is at an ALIGNED offset (store offsets
      wp+1 / wp / wp-1: two sublane rotates total);
    - the 3x3 runs as ONE MXU pass (rows+2wp, 3c) @ (3c, 3c) with the kh taps
      batched into the OUTPUT dim: P[u, kh*c+j] = sum_{kw,k} z1i[u, kw*c+k] *
      w2[kh,kw,k,j].  z2[t] = sum_kh P[t + kh*wp, kh-block] — three ALIGNED
      fp32 slice-adds.  At c=64 this lifts the MXU N-width from 64 (50%
      utilisation) to 192, and replaces three dots with one;
    - conv3 + bias + residual + ReLU is computed in row chunks written
      straight to the output block, so no full-size fp32 stack buffer;
    - the interior mask is applied with a NaN-killing ``where`` (a multiply
      would propagate NaNs from the previous block's garbage ring:
      NaN * 0 == NaN, and ring z1 feeds interior z2 through the taps).
    """
    rows = bt * hp * wp

    # --- conv1 (1x1, 4c -> c); where-mask zeroes the ring row-wise.
    z1 = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    z1 = jnp.maximum(z1 + b1_ref[:].astype(jnp.float32), 0.0)
    z1 = jnp.where(
        mask_ref[:].reshape(1, hp * wp, 1) > 0, z1.reshape(bt, hp * wp, c), 0.0
    )
    z1 = z1.reshape(rows, c).astype(z1_ref.dtype)

    # Zero the scratch regions the taps read but the interleave never writes
    # (ring garbage there would otherwise be NaN-capable).
    z1_ref[0 : wp + 8, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)
    z1_ref[rows + wp - 8 : rows + 2 * wp, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)

    # kw-interleave at offsets wp+1-kw (kw=1 lands aligned on wp).
    for kw in range(3):
        z1_ref[wp + 1 - kw : wp + 1 - kw + rows, kw * c : (kw + 1) * c] = z1

    # --- conv2 (3x3 s1): one MXU pass, kh batched into N.
    P = jnp.dot(z1_ref[:], w2p_ref[:], preferred_element_type=jnp.float32)
    acc2 = (
        jax.lax.slice(P, (0, 0), (rows, c))
        + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c))
        + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c))
    )
    z2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0).astype(
        z1_ref.dtype
    )

    # --- conv3 (1x1, c -> 4c) + residual + ReLU, chunked straight into the
    # output block (bounds the fp32 stack to one chunk).
    chunk = rows
    while chunk > 1024 and chunk % 2 == 0:
        chunk //= 2
    for lo in range(0, rows, chunk):
        y = jnp.dot(
            jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
            w3_ref[:],
            preferred_element_type=jnp.float32,
        )
        y = y + b3_ref[:].astype(jnp.float32)
        y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32)
        o_ref[lo : lo + chunk, :] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


def chain_meta(b: int, h: int, w_sp: int) -> tuple[int, int]:
    """(hp, wp) of the chained padded-row layout for (B, H, W, C) inputs.

    Default wp = round_up(w+2, 8) (left pad col + w interior + >=1 right pad,
    sublane-aligned).  When w+1 is already a multiple of 8 the RIGHT pad
    column is dropped entirely: in flat row space, row r's kw=+1 tap past the
    last interior column lands on row r+1's LEFT pad zero — the same zero
    column is shared as right pad of r and left pad of r+1.  For w=7 this
    gives wp=8 instead of 16: half the padded rows (ResNet's 7x7 stage was
    2.9x compute-padded before this).
    """
    w2 = w_sp + 1 if (w_sp + 1) % 8 == 0 else _round_up(w_sp + 2, 8)
    return h + 2, w2


def pad_for_chain(x: jax.Array) -> jax.Array:
    """NHWC -> flat padded rows (B*Hp*Wp, C): one XLA pad, paid once per
    chain of blocks instead of once per block."""
    b, h, w_sp, c4 = x.shape
    hp, wp = chain_meta(b, h, w_sp)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w_sp - 1), (0, 0)))
    return x_pad.reshape(b * hp * wp, c4)


def unpad_from_chain(xr: jax.Array, b: int, h: int, w_sp: int) -> jax.Array:
    """Flat padded rows -> NHWC (an XLA slice; fuses into the consumer)."""
    hp, wp = chain_meta(b, h, w_sp)
    c4 = xr.shape[-1]
    return xr.reshape(b, hp, wp, c4)[:, 1 : 1 + h, 1 : 1 + w_sp, :]


def _pick_bt_chain(b: int, hp: int, wp: int, c: int, c4: int) -> int:
    """Largest divisor of B whose chained working set fits the VMEM budget."""
    budget = 9 * 2**20
    weights = (c4 * c + 9 * c * c + c * c4) * 2
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        rows = bt * hp * wp
        work = (
            rows * c4 * 2              # x block (bf16)
            + (rows + 2 * wp) * 3 * c * 2  # kw-interleaved z1 (bf16)
            + rows * c * 4             # 3x3 accumulator (fp32)
            + rows * c4 * 4            # final accumulator (fp32)
            + weights
        )
        if work > budget:
            break
        best = bt
    return best


@functools.partial(jax.jit, static_argnames=("h", "w_sp", "bt", "interpret"))
def bottleneck_block_chained(
    xr: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    *,
    h: int, w_sp: int,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One stride-1 bottleneck block over the chained padded-row layout.

    xr: (B*Hp*Wp, 4c) from pad_for_chain (or a previous chained block); the
    output has the same shape/layout, so N consecutive blocks cost one pad +
    N kernels + one unpad — the per-block XLA pad/relayout passes of
    bottleneck_block_fused (measured ~25-40%% of its time at 56^2,
    tools/probe_block_phases.py) disappear.

    The ring rows of the output are garbage by design: the next block's
    where-mask zeroes them in z1 before they can reach any interior value,
    and unpad_from_chain strips them at the stage boundary.
    """
    if w1.ndim == 4:
        w1 = w1[0, 0]
    if w3.ndim == 4:
        w3 = w3[0, 0]
    c = w1.shape[-1]
    c4 = w1.shape[0]
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, c4_in = xr.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and c4_in == c4, (xr.shape, (b, hp, wp, c4))
    bt = bt or _pick_bt_chain(b, hp, wp, c, c4)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)

    # kh batched into the 3x3 weight's output dim: w2p[(kw,k),(kh,j)].
    w2p = jnp.transpose(w2, (1, 2, 0, 3)).reshape(3 * c, 3 * c)

    rows = bt * hp * wp
    return pl.pallas_call(
        functools.partial(
            _chained_kernel, bt=bt, hp=hp, wp=wp, c=c, c4=c4,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c4), lambda i: (i, 0)),
            pl.BlockSpec((c4, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((hp * wp, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c4), xr.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * c), xr.dtype),  # kw-interleaved z1
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * (c4 * c + 9 * c * c + c * c4),
            bytes_accessed=2 * (b * hp * wp * c4 * 2)
            + (c4 * c + 9 * c * c + c * c4) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, w1, b1[None, :], w2p, b2[None, :], w3, b3[None, :], mask)


# ---------------------------------------------------------------------------
# Int8 chained variant: producer-epilogue quantization.  Activations live in
# HBM as int8 (half the bf16 DMA traffic) and every dot runs on the int8 MXU
# path (~1.8x bf16 throughput on v5e, measured).  Weights are per-output-
# channel symmetric int8 (quantized AFTER BN fold); activations use static
# per-site scales from calibration (ops.pallas.fused.calibrate_chain_scales).
# ---------------------------------------------------------------------------


def _chained_kernel_int8(
    x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    sw1_ref, sw2p_ref, sw3_ref, s_ref,
    o_ref, z1_ref,
    *, bt, hp, wp, c, c4, emit_i8,
):
    """Int8 twin of _chained_kernel.

    x_ref (rows, 4c) int8 at scale s_x; all weights int8 with per-output-
    channel f32 scales; biases f32.  s_ref (SMEM, (4,)) = [s_x, s_z1, s_z2,
    s_y].  Intermediates are requantized in-register (producer epilogue), so
    z1/z2 never exist above int8 precision outside the accumulator.  The ring
    garbage story is identical to the bf16 kernel, except int8 has no NaNs —
    the where-mask is still used so ring values can't reach interior taps.
    """
    rows = bt * hp * wp
    s_x, s_z1, s_z2, s_y = s_ref[0], s_ref[1], s_ref[2], s_ref[3]

    # --- conv1 (1x1, 4c -> c): int8 MXU dot, dequant+bias+relu+requant.
    z1 = jax.lax.dot_general(
        x_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Scalar factors multiply the big tensor directly; only pure ref-loaded
    # per-channel rows broadcast against 2-D values (computed (1, c) values
    # pick up offset layouts Mosaic can't broadcast — the s_x*row product
    # and lane-offset slices of a (1, 3c) row both tripped this).
    z1 = z1.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32) * s_x
    z1 = jnp.maximum(z1 + b1_ref[:].astype(jnp.float32), 0.0)
    z1 = jnp.where(
        mask_ref[:].reshape(1, hp * wp, 1) > 0, z1.reshape(bt, hp * wp, c), 0.0
    )
    z1 = jnp.clip(
        jnp.round(z1.reshape(rows, c) * (1.0 / s_z1)), -127.0, 127.0
    ).astype(jnp.int8)

    z1_ref[0 : wp + 8, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)
    z1_ref[rows + wp - 8 : rows + 2 * wp, :] = jnp.zeros((wp + 8, 3 * c), z1_ref.dtype)
    for kw in range(3):
        z1_ref[wp + 1 - kw : wp + 1 - kw + rows, kw * c : (kw + 1) * c] = z1

    # --- conv2 (3x3 s1): one int8 MXU pass, kh batched into N.  The packed
    # weight's per-column scales are per (kh, j), so each kh slice is
    # dequantized with its own scale vector before the fp32 slice-add.
    P = jax.lax.dot_general(
        z1_ref[:], w2p_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # sw2p_ref is (3, c): row kh holds that kh block's per-j scales, sliced
    # on SUBLANES (clean layout); the common s_z1 factor scales the sum once.
    acc2 = (
        jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
        * sw2p_ref[0:1, :].astype(jnp.float32)
        + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
        * sw2p_ref[1:2, :].astype(jnp.float32)
        + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)).astype(jnp.float32)
        * sw2p_ref[2:3, :].astype(jnp.float32)
    )
    z2 = jnp.maximum(acc2 * s_z1 + b2_ref[:].astype(jnp.float32), 0.0)
    z2 = jnp.clip(jnp.round(z2 * (1.0 / s_z2)), -127.0, 127.0).astype(jnp.int8)

    # --- conv3 (1x1, c -> 4c) + residual (dequantized x) + ReLU, chunked.
    chunk = rows
    while chunk > 1024 and chunk % 2 == 0:
        chunk //= 2
    for lo in range(0, rows, chunk):
        y = jax.lax.dot_general(
            jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
            w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32) * s_z2
        y = y + b3_ref[:].astype(jnp.float32)
        y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32) * s_x
        y = jnp.maximum(y, 0.0)
        if emit_i8:
            o_ref[lo : lo + chunk, :] = jnp.clip(
                jnp.round(y * (1.0 / s_y)), -127.0, 127.0
            ).astype(jnp.int8)
        else:
            o_ref[lo : lo + chunk, :] = y.astype(o_ref.dtype)


def _pick_bt_chain_int8(b: int, hp: int, wp: int, c: int, c4: int) -> int:
    """Largest divisor of B whose int8 chained working set fits VMEM budget."""
    budget = 9 * 2**20
    weights = c4 * c + 9 * c * c + c * c4  # int8: 1 byte each
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        rows = bt * hp * wp
        work = (
            rows * c4 * 1                    # x block (int8)
            + (rows + 2 * wp) * 3 * c * 1    # kw-interleaved z1 (int8)
            + (rows + 2 * wp) * 3 * c * 4    # P (int32, stack)
            + rows * c * 4                   # acc2 fp32
            + weights
        )
        if work > budget:
            break
        best = bt
    return best


@functools.partial(jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret"))
def bottleneck_block_chained_int8(
    xq: jax.Array,
    w1q: jax.Array, sw1: jax.Array, b1: jax.Array,
    w2pq: jax.Array, sw2p: jax.Array, b2: jax.Array,
    w3q: jax.Array, sw3: jax.Array, b3: jax.Array,
    scales: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Int8 stride-1 bottleneck block over the chained padded-row layout.

    xq: (B*Hp*Wp, 4c) int8 rows at scale scales[0]; w1q (4c,c) / w3q (c,4c)
    int8 with per-column scales sw1/sw3; w2pq (3c,3c) the kh-batched packed
    3x3 (see quantize_chain_block) with per-column scales sw2p; biases f32.
    scales: (4,) f32 = [s_x, s_z1, s_z2, s_y].  Output is the same padded-row
    layout, int8 at scale s_y when emit_i8 else o_dtype=bf16 (chain exit).
    """
    c = w1q.shape[-1]
    c4 = w1q.shape[0]
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, c4_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and c4_in == c4, (xq.shape, (b, hp, wp, c4))
    bt = bt or _pick_bt_chain_int8(b, hp, wp, c, c4)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)

    rows = bt * hp * wp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(
            _chained_kernel_int8, bt=bt, hp=hp, wp=wp, c=c, c4=c4,
            emit_i8=emit_i8,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c4), lambda i: (i, 0)),
            pl.BlockSpec((c4, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((hp * wp, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c4), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * c), jnp.int8),  # kw-interleaved z1
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * (c4 * c + 9 * c * c + c * c4),
            bytes_accessed=2 * (b * hp * wp * c4)
            + (c4 * c + 9 * c * c + c * c4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xq, w1q, b1[None, :], w2pq, b2[None, :], w3q, b3[None, :], mask,
        sw1[None, :], sw2p.reshape(3, c), sw3[None, :], scales,
    )


def quantize_chain_block(blk: dict) -> dict:
    """Quantize one BN-folded bottleneck block for the int8 chained kernel.

    Input: the folded tree entry {"conv1": {weight (1,1,4c,c), bias}, "conv2":
    {weight (3,3,c,c), bias}, "conv3": {weight (1,1,c,4c), bias}}.  Output:
    int8 weights + per-output-channel scales, with conv2 packed kh-batched
    ((kw,k) x (kh,j), the layout _chained_kernel_int8 consumes) and its
    scales per (kh, j) column — strictly more precise than one scale per j.
    """
    from resnetc_tpu.ops.pallas.quant import quantize_per_channel

    w1 = blk["conv1"]["weight"]
    w2 = blk["conv2"]["weight"]
    w3 = blk["conv3"]["weight"]
    if w1.ndim == 4:
        w1 = w1[0, 0]
    if w3.ndim == 4:
        w3 = w3[0, 0]
    c = w1.shape[-1]
    w2p = jnp.transpose(w2, (1, 2, 0, 3)).reshape(3 * c, 3 * c)
    w1q, sw1 = quantize_per_channel(w1)
    w2pq, sw2p = quantize_per_channel(w2p)
    w3q, sw3 = quantize_per_channel(w3)
    return {
        "w1q": w1q, "sw1": sw1, "b1": blk["conv1"]["bias"],
        "w2pq": w2pq, "sw2p": sw2p, "b2": blk["conv2"]["bias"],
        "w3q": w3q, "sw3": sw3, "b3": blk["conv3"]["bias"],
    }


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def bottleneck_block_fused(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    *,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One stride-1 bottleneck residual block, fused.

    x: (B, H, W, 4c) NHWC; w1: (4c, c) or (1,1,4c,c); w2: (3,3,c,c);
    w3: (c, 4c) or (1,1,c,4c); biases BN-folded. Output (B, H, W, 4c),
    dtype = x.dtype, fp32 accumulation throughout.
    """
    if w1.ndim == 4:
        w1 = w1[0, 0]
    if w3.ndim == 4:
        w3 = w3[0, 0]
    b, h, w_sp, c4 = x.shape
    c = w1.shape[-1]
    assert w1.shape == (c4, c) and w2.shape == (3, 3, c, c) and w3.shape == (c, c4), (
        w1.shape, w2.shape, w3.shape, x.shape,
    )

    # Wp multiple of 8: kh*Wp tap offsets stay sublane-aligned, and every
    # row-block size is automatically divisible by 8.
    wp = _round_up(w_sp + 2, 8)
    bt = bt or _pick_bt(b, h + 2, wp, c, c4)

    # Grow bottom padding until the furthest shifted slice fits.
    extra = 0
    while True:
        hp = h + 2 + extra
        m_acc = _round_up((bt - 1) * hp * wp + h * wp, 128)
        if m_acc + 2 * wp + 2 <= bt * hp * wp:
            break
        extra += 1

    x_pad = jnp.pad(
        x, ((0, 0), (1, 1 + extra), (1, wp - w_sp - 1), (0, 0))
    )
    x_rows = x_pad.reshape(b * hp * wp, c4)

    # 0/1 interior mask over one image's padded rows (pad ring + tail = 0).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = (
        (r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)
    ).astype(jnp.float32)

    grid = (b // bt,)
    out = pl.pallas_call(
        functools.partial(
            _block_kernel,
            bt=bt, hp=hp, wp=wp, h=h, w_out=w_sp, m_acc=m_acc, c=c, c4=c4,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt * hp * wp, c4), lambda i: (i, 0)),
            pl.BlockSpec((c4, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((hp * wp, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, h, wp, c4), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, c4), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * hp * wp, 3 * c), x.dtype),  # kw-interleaved z1
            pltpu.VMEM((m_acc, c), jnp.float32),         # 3x3 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * (c4 * c + 9 * c * c + c * c4),
            bytes_accessed=2 * (b * hp * wp * c4 * 2)
            + (c4 * c + 9 * c * c + c * c4) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x_rows, w1, b1[None, :], w2, b2[None, :], w3, b3[None, :], mask,
    )
    return out[:, :, :w_sp, :]
