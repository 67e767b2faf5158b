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


def _interleave_kw(il_ref, vals, *, rows, wp, slot, width):
    """Write ``vals`` (rows, width) into the kw-interleaved conv scratch:
    zero head/tail fills (load-bearing — see the chain-kernel history), then
    one store per kw slot at row offset wp+1-kw (kw=1 lands aligned on wp;
    the ±1 offsets pay one sublane rotate each — a VMEM->VMEM DMA
    alternative is rejected by Mosaic: misaligned-row DMA slices only work
    on untiled dims).  Slots sit at 128-aligned lane offsets (``slot``);
    padded weight rows are ZERO at slot tails so slot-lane garbage
    multiplies zero.  Shared by the bottleneck chain, stage-run, and basic
    kernels — the invariants live once."""
    il_ref[0 : wp + 8, :] = jnp.zeros((wp + 8, 3 * slot), il_ref.dtype)
    il_ref[rows + wp - 8 : rows + 2 * wp, :] = jnp.zeros(
        (wp + 8, 3 * slot), il_ref.dtype
    )
    for kw in range(3):
        il_ref[
            wp + 1 - kw : wp + 1 - kw + rows, kw * slot : kw * slot + width
        ] = vals


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: Mosaic scoped-VMEM limit for the megakernels.  Raised 16MB -> 100MB in
#: round 3 (under a DEGRADED chip window) to let bt grow; the round-5
#: healthy-window regress A/B exposed that kernels compiled under the
#: raised cap run ~1.7x SLOWER in healthy weather than the round-2 builds
#: (same compute body) — so the cap is now a module knob the battery can
#: A/B directly.  See REGRESS_AB_KERNEL.json / PERF.md round 5.
VMEM_CAP_BYTES: int = 100 * 2**20


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
    *, bt, hp, wp, c, c4, slot, emit_i8,
    wd_ref=None, swd_ref=None, bd_ref=None,
    emit_mean=False, imask_ref=None, conv2_chunked=False,
):
    """Int8 twin of _chained_kernel, with HOST-FOLDED requant scales.

    With ``emit_mean`` (the network-tail head fold): instead of storing the
    (rows, c4) activation, the epilogue accumulates per-image interior means
    into o_ref (bt, c4) f32 via imask_ref (bt, rows) — the block-diagonal
    interior mask pre-divided by h*w — so the tail block's activation NEVER
    crosses HBM (84 MB round trip saved at ResNet-50 b256) and the head
    reduces to one fc matmul.  Replaces the reference's standalone
    global-avg-pool pass (cuda/ops.cu avgPool + main.cu head).

    x_ref (rows, cin) int8 at scale s_x.  The wrapper folds every scalar
    requant factor into the per-channel vectors before the call: sw1 :=
    sw1*s_x/s_z1, b1 := b1/s_z1, sw2p := sw2p*s_z1/s_z2, b2 := b2/s_z2,
    sw3 := sw3*s_z2/s_y, b3 := b3/s_y (swd/bd likewise with s_x/s_y), so
    each epilogue is one fused multiply-add + relu + round/clip — the
    epilogues are the kernel's VPU bill and every removed per-element op
    counts.  s_ref (SMEM, (1,)) holds only the identity-residual scale
    s_x/s_y.  mask_ref (rows, 1) is the interior mask pre-tiled over bt
    (multiply replaces the old reshape/where/reshape dance; int8 garbage is
    finite so mask-by-multiply is exact).
    """
    rows = bt * hp * wp
    s_res = s_ref[0]

    # --- conv1 (1x1, cin -> c): int8 MXU dot, fused dequant+bias+relu+mask.
    # Per-channel rows come straight from refs (computed (1, c) values pick
    # up offset layouts Mosaic can't broadcast); scalars multiply the big
    # tensor directly.
    z1 = jax.lax.dot_general(
        x_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z1 = jnp.maximum(
        z1.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
        + b1_ref[:].astype(jnp.float32),
        0.0,
    )
    z1 = z1 * mask_ref[:]
    # TWO-SIDED clip is load-bearing for SPEED, not semantics: post-relu the
    # lower bound never binds (bit-identical either way), but with clip's
    # provable [-127,127] range Mosaic emits the cheap f32->int8 convert,
    # while the round-3 "drop dead lower clips" change (e1a59d4, landed 90
    # minutes INTO the 08-17 degraded window) left the cast unbounded below
    # and the whole L1 kernel ~1.7x slower — measured healthy-window
    # 2026-08-20: minimum 2.68-2.75 ms vs clip 1.58 (bt=1), r2 build 1.54.
    # This WAS the "int8_chain regression" of VERDICT r4 weak #1.
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

    # The head/tail zero-fills inside ARE load-bearing even in int8
    # (removing them broke interior parity in interpret mode).  A PAIRED
    # two-kw-per-tile layout (K 384 -> 256, all stores tile-aligned) was
    # tried in round 3 and measured WORSE (L1b1 1.53 -> 1.79 ms, L1b0
    # 1.63 -> 6.69 ms): the value-level int8 lane concats it needs are
    # exactly the in-kernel lane-repacking relayout trap.
    _interleave_kw(z1_ref, z1, rows=rows, wp=wp, slot=slot, width=c)

    # --- conv2 (3x3 s1) + conv3 + epilogue.
    #
    # Default: conv2 as one int8 MXU pass over the whole block, kh batched
    # into N; the packed weight's per-column scales are per (kh, j), so each
    # kh slice is dequantized with its own scale vector (sliced on SUBLANES,
    # a clean layout).  The int32 P stack (rows+2wp, 3c) is the kernel's
    # VMEM pig (~2.7MB per bt at L1).
    #
    # conv2_chunked: conv2 folds INTO the conv3 row-chunk loop — each chunk
    # recomputes its own (chunk+2wp, 3c) P window (2wp redundant rows, ~2-4%
    # extra dot flops) so the resident P shrinks ~(rows/chunk)x, which is
    # what lets bt grow past the measured per-grid-step-overhead knee.
    if conv2_chunked:
        z2 = None  # computed per chunk below
    else:
        P = jax.lax.dot_general(
            z1_ref[:], w2p_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc2 = (
            jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
            * sw2p_ref[0:1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
            * sw2p_ref[1:2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)).astype(jnp.float32)
            * sw2p_ref[2:3, :].astype(jnp.float32)
        )
        z2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0)
        z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)

    # --- conv3 (1x1, c -> 4c) + residual (dequantized x) + ReLU, chunked.
    chunk = rows
    while chunk > 1024 and chunk % 2 == 0:
        chunk //= 2
    for lo in range(0, rows, chunk):
        if conv2_chunked:
            Pc = jax.lax.dot_general(
                z1_ref[lo : lo + chunk + 2 * wp, :], w2p_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc2 = (
                jax.lax.slice(Pc, (0, 0), (chunk, c)).astype(jnp.float32)
                * sw2p_ref[0:1, :].astype(jnp.float32)
                + jax.lax.slice(Pc, (wp, c), (wp + chunk, 2 * c)).astype(jnp.float32)
                * sw2p_ref[1:2, :].astype(jnp.float32)
                + jax.lax.slice(Pc, (2 * wp, 2 * c), (2 * wp + chunk, 3 * c)).astype(
                    jnp.float32
                )
                * sw2p_ref[2:3, :].astype(jnp.float32)
            )
            z2c = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0)
            z2c = jnp.clip(jnp.round(z2c), -127.0, 127.0).astype(jnp.int8)
        else:
            z2c = jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0)
        y = jax.lax.dot_general(
            z2c,
            w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        if wd_ref is None:
            y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32) * s_res
        else:
            # Projection shortcut (layer1 block0): the residual is a 1x1
            # conv of x (cin -> 4c) instead of x itself — one more int8 dot
            # in the same epilogue, x still read once.
            sc = jax.lax.dot_general(
                x_ref[lo : lo + chunk, :], wd_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y + (
                sc.astype(jnp.float32) * swd_ref[:].astype(jnp.float32)
                + bd_ref[:].astype(jnp.float32)
            )
        y = jnp.maximum(y, 0.0)
        if emit_mean:
            contrib = jax.lax.dot_general(
                imask_ref[:, lo : lo + chunk], y,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if lo == 0:
                o_ref[:] = contrib
            else:
                o_ref[:] += contrib
        elif emit_i8:
            o_ref[lo : lo + chunk, :] = jnp.clip(
                jnp.round(y), -127.0, 127.0
            ).astype(jnp.int8)
        else:
            o_ref[lo : lo + chunk, :] = y.astype(o_ref.dtype)


#: Measured best bt per stage (keyed by c), b256 ResNet-50 chain shapes.
#: Re-swept 2026-08-20 in a HEALTHY window (copy 700-1200 GB/s) with the
#: clip-restored kernels (tools/battery/bt_sweep.py, bt=1 included,
#: repeats=5; the earlier r3/r4 tables were tuned under degraded windows
#: against the clip-regressed kernels):
#: L1 c=64: bt=2 (1.496 ms; bt=1 1.563, bt=4 1.600, bt=8 1.818; bt>=16
#: fails to compile); L2 c=128: bt=4 (0.588 ms, 64-iter 9-repeat
#: re-check — two-point sub-ms readings of 0.21-0.28 exceeded the int8
#: MXU peak and were RTT-jitter artifacts); L3 c=256: bt=16 (0.354, tied
#: with 32); L4 c=512: bt=16 (0.427; bt=32 0.453).
_MEASURED_BT_CHAIN = {64: 2, 128: 4, 256: 16, 512: 16}


def _pick_bt_chain_int8(b: int, hp: int, wp: int, c: int, c4: int) -> int:
    """Measured-table bt when it applies, else largest divisor of B whose
    int8 chained working set fits the VMEM budget."""
    budget = 40 * 2**20  # of the 100MB cap: in/out auto-double-buffered
    # Measured hits were compile+run-validated by the sweep at their b256
    # geometry, so they only need to clear the hard cap (L4 bt=32's
    # estimated working set is ~87MB and it measures fastest); the
    # conservative 40MB walk budget stays for unmeasured geometries.
    hit_cap = 90 * 2**20
    slot = _round_up(c, 128)  # kw slots pad to full lane tiles (c=64 case)
    weights = c4 * c + 9 * c * c + c * c4  # int8: 1 byte each

    def work(bt: int) -> int:
        rows = bt * hp * wp
        return (
            2 * rows * c4 * 1                   # x block (double-buffered)
            + (rows + 2 * wp) * 3 * slot * 1    # kw-interleaved z1 (int8)
            + (rows + 2 * wp) * 3 * c * 4       # P (int32, stack)
            + rows * c * 4                      # acc2 fp32
            + 2 * rows * c4 * 1                 # out block (double-buffered)
            + weights
        )

    hit = _MEASURED_BT_CHAIN.get(c)
    if hit is not None and b % hit == 0 and work(hit) <= hit_cap:
        return hit
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


def _chained_kernel_int8_mdma(
    x_hbm_ref, *refs,
    bt, hp, wp, c, c4, slot, emit_i8, has_ds,
):
    """Manual-DMA twin of _chained_kernel_int8: x stays in HBM/ANY and the
    kernel streams row blocks itself, DOUBLE-BUFFERED across grid steps —
    step i computes from xbuf[i%2] while step i+1's rows stream into
    xbuf[(i+1)%2] (same pattern as _ds_block_s2_kernel's plane gather).
    Exists because the L1 phase probe showed the auto-pipelined kernel runs
    DMA + compute SERIALLY (p0 copy floor 0.6 ms healthy + ~0.9 ms compute
    ≈ the measured 1.53 ms; see ROADMAP round 3).

    MEASURED NEUTRAL at L1b1 (2026-08-17, degraded-machine A/B, rankings
    valid): manual bt=1 2.742 ms vs auto 2.722; bt=2 2.744 vs 2.743 — the
    delivery mechanism is not what serializes the stream against compute.
    Kept as the reference implementation of row-streamed manual DMA (the
    entry-fold and future gather kernels build on it) and because the
    bitmatch test pins the pattern."""
    if has_ds:
        (w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3,
         wd, sd, bd_, s, o, z1, xbuf, sems) = refs
    else:
        (w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3,
         s, o, z1, xbuf, sems) = refs
        wd = sd = bd_ = None
    rows = bt * hp * wp
    i = pl.program_id(0)

    def row_dma(step, buf):
        return pltpu.make_async_copy(
            x_hbm_ref.at[pl.ds(step * rows, rows), :],
            xbuf.at[buf],
            sems.at[buf],
        )

    @pl.when(i == 0)
    def _():
        row_dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        row_dma(i + 1, (i + 1) % 2).start()

    cur = i % 2
    row_dma(i, cur).wait()
    _chained_kernel_int8(
        xbuf.at[cur], w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3, s, o, z1,
        bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot, emit_i8=emit_i8,
        wd_ref=wd, swd_ref=sd, bd_ref=bd_,
    )


def _pipe_dma_wrap(body, x_hbm_ref, o_hbm_ref, xbuf, obuf, isems, osems,
                   rows):
    """Fully-manual double-buffered row-stream pipeline around ``body``.

    BOTH the input row stream AND the output row stream become in-kernel
    async copies (x and o live in HBM/ANY): step i's input prefetch was
    fired at step i-1, the body computes into obuf[i%2], the store DMA is
    fired and only WAITED two steps later when the buffer is reused (plus
    a drain on the final step).

    Why this exists: the chain kernels measure DMA + compute SERIAL per
    grid step (L1b1 healthy 1.53 ms ≈ 0.6 ms p0 copy floor + 0.9 ms
    compute — tools/probe_chain_phases, PERF.md round 3), yet a copy
    kernel can hide 70-85% of independent dot time on this part.  The
    mdma variant manualized only the INPUT stream and measured neutral —
    so the remaining serialization suspect is the auto-pipeline's OUTPUT
    window flush (step i+1's body gated on step i's out-buffer swap),
    which only manualizing both streams removes.  ``body(x_vmem, o_vmem)``
    is the unchanged compute; output is bit-identical to the auto kernel.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def in_dma(step, buf):
        return pltpu.make_async_copy(
            x_hbm_ref.at[pl.ds(step * rows, rows), :], xbuf.at[buf],
            isems.at[buf],
        )

    def out_dma(step, buf):
        return pltpu.make_async_copy(
            obuf.at[buf], o_hbm_ref.at[pl.ds(step * rows, rows), :],
            osems.at[buf],
        )

    @pl.when(i == 0)
    def _():
        in_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        in_dma(i + 1, (i + 1) % 2).start()

    cur = i % 2
    in_dma(i, cur).wait()

    # obuf[cur]'s previous flight (step i-2) must land before the body
    # overwrites the buffer.
    @pl.when(i >= 2)
    def _():
        out_dma(i - 2, cur).wait()

    body(xbuf.at[cur], obuf.at[cur])

    out_dma(i, cur).start()

    # Drain on the final step: up to two stores still in flight.
    @pl.when((i == n - 1) & (n >= 2))
    def _():
        out_dma(i - 1, (i - 1) % 2).wait()

    @pl.when(i == n - 1)
    def _():
        out_dma(i, cur).wait()


def _chained_kernel_int8_pipe(
    x_hbm_ref, *refs,
    bt, hp, wp, c, c4, slot, emit_i8, has_ds,
):
    """Pipe-DMA twin of _chained_kernel_int8 (see _pipe_dma_wrap)."""
    if has_ds:
        (w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3,
         wd, sd, bd_, s, o_hbm, z1, xbuf, obuf, isems, osems) = refs
    else:
        (w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3,
         s, o_hbm, z1, xbuf, obuf, isems, osems) = refs
        wd = sd = bd_ = None
    rows = bt * hp * wp

    def body(x_vmem, o_vmem):
        _chained_kernel_int8(
            x_vmem, w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3, s,
            o_vmem, z1,
            bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot, emit_i8=emit_i8,
            wd_ref=wd, swd_ref=sd, bd_ref=bd_,
        )

    _pipe_dma_wrap(body, x_hbm_ref, o_hbm, xbuf, obuf, isems, osems, rows)


@functools.partial(jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret", "manual_dma", "emit_mean", "conv2_chunked", "pipe_dma"))
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
    manual_dma: bool = False,
    emit_mean: bool = False,
    conv2_chunked: bool = False,
    pipe_dma: bool = False,
    wdq: jax.Array | None = None,
    swd: jax.Array | None = None,
    bd: jax.Array | None = None,
) -> jax.Array:
    """Int8 stride-1 bottleneck block over the chained padded-row layout.

    xq: (B*Hp*Wp, cin) int8 rows at scale scales[0]; w1q (cin,c) / w3q (c,4c)
    int8 with per-column scales sw1/sw3; w2pq (3c,3c) the kh-batched packed
    3x3 (see quantize_chain_block) with per-column scales sw2p; biases f32.
    scales: (4,) f32 = [s_x, s_z1, s_z2, s_y].  Output is the same padded-row
    layout, int8 at scale s_y when emit_i8 else o_dtype=bf16 (chain exit).

    With wdq/swd/bd (a per-output-channel-quantized 1x1, (cin, 4c)) the
    residual is the PROJECTION shortcut conv instead of identity — the
    stride-1 downsample block (ResNet-50 layer1 block 0), still one kernel
    and one read of x.  cin == 4c is required for the identity form only.

    With emit_mean (network tail only; requires emit_i8=False): returns
    (B, 4c) f32 per-image global-average-pooled features instead of the
    (B*Hp*Wp, 4c) activation — the head fold (see _chained_kernel_int8).
    """
    c = w1q.shape[-1]
    cin = w1q.shape[0]
    c4 = w3q.shape[-1]
    has_ds = wdq is not None
    assert has_ds or cin == c4, (cin, c4)
    assert not (emit_mean and (emit_i8 or manual_dma)), (
        "emit_mean is the bf16-exit head fold; emit_i8/manual_dma don't apply"
    )
    assert not (manual_dma and conv2_chunked), (
        "manual_dma fixes the compute body; use one variant at a time"
    )
    assert not (pipe_dma and (manual_dma or emit_mean or conv2_chunked)), (
        "pipe_dma is its own full-DMA variant; combine with nothing"
    )
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == cin, (xq.shape, (b, hp, wp, cin))
    bt = bt or _pick_bt_chain_int8(b, hp, wp, c, max(cin, c4))

    rows = bt * hp * wp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16

    # kw slots padded to 128 lanes at c=64 (see kernel); the packed weight
    # grows zero rows at each slot tail so slot-lane garbage multiplies 0.
    slot = _round_up(c, 128)
    if slot != c:
        w2pq = jnp.pad(
            w2pq.reshape(3, c, 3 * c), ((0, 0), (0, slot - c), (0, 0))
        ).reshape(3 * slot, 3 * c)

    # Host-side scale folding (see _chained_kernel_int8 docstring): all
    # scalar requant factors move into the per-channel vectors so the
    # kernel's per-element epilogues shrink to one multiply-add each.
    # The bf16 exit (emit_i8=False) emits UNSCALED activations: s_y = 1.
    s_x, s_z1, s_z2 = scales[0], scales[1], scales[2]
    s_y = scales[3] if emit_i8 else jnp.float32(1.0)
    a1 = (sw1.astype(jnp.float32) * (s_x / s_z1))[None, :]
    c1 = (b1.astype(jnp.float32) * (1.0 / s_z1))[None, :]
    a2 = (sw2p.astype(jnp.float32) * (s_z1 / s_z2)).reshape(3, c)
    c2 = (b2.astype(jnp.float32) * (1.0 / s_z2))[None, :]
    a3 = (sw3.astype(jnp.float32) * (s_z2 / s_y))[None, :]
    c3 = (b3.astype(jnp.float32) * (1.0 / s_y))[None, :]
    s_res = jnp.reshape(s_x / s_y, (1,)).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_t = jnp.tile(mask, (bt, 1))

    in_specs = [
        pl.BlockSpec((rows, cin), lambda i: (i, 0)),
        pl.BlockSpec((cin, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((3 * slot, 3 * c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, c4), lambda i: (0, 0)),
        pl.BlockSpec((1, c4), lambda i: (0, 0)),
        pl.BlockSpec((rows, 1), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((3, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c4), lambda i: (0, 0)),
    ]
    operands = [
        xq, w1q, c1, w2pq, c2, w3q, c3, mask_t,
        a1, a2, a3,
    ]
    if has_ds:
        ad = (swd.astype(jnp.float32) * (s_x / s_y))[None, :]
        cd = (bd.astype(jnp.float32) * (1.0 / s_y))[None, :]
        in_specs += [
            pl.BlockSpec((cin, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
        ]
        operands += [wdq, ad, cd]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    operands.append(s_res)
    if emit_mean:
        # Block-diagonal interior mask, pre-divided by h*w: one f32 dot per
        # conv3 chunk turns the stored activation into per-image means.
        imask = jnp.kron(
            jnp.eye(bt, dtype=jnp.float32),
            (mask / (h * w_sp)).reshape(1, hp * wp),
        )
        in_specs.append(pl.BlockSpec((bt, rows), lambda i: (0, 0)))
        operands.append(imask)

    def kernel(*refs):
        x, w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3 = refs[:11]
        idx = 11
        wd = sd = bd_ = None
        if has_ds:
            wd, sd, bd_ = refs[idx : idx + 3]
            idx += 3
        s = refs[idx]
        idx += 1
        im = None
        if emit_mean:
            im = refs[idx]
            idx += 1
        o, z1 = refs[idx], refs[idx + 1]
        _chained_kernel_int8(
            x, w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3, s, o, z1,
            bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot, emit_i8=emit_i8,
            wd_ref=wd, swd_ref=sd, bd_ref=bd_,
            emit_mean=emit_mean, imask_ref=im, conv2_chunked=conv2_chunked,
        )

    scratch = [
        pltpu.VMEM((rows + 2 * wp, 3 * slot), jnp.int8),  # kw-interleaved z1
    ]
    if manual_dma:
        in_specs[0] = pl.BlockSpec(memory_space=pl.ANY)
        kernel = functools.partial(
            _chained_kernel_int8_mdma,
            bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot, emit_i8=emit_i8,
            has_ds=has_ds,
        )
        scratch += [
            pltpu.VMEM((2, rows, cin), jnp.int8),  # double-buffered x rows
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif pipe_dma:
        in_specs[0] = pl.BlockSpec(memory_space=pl.ANY)
        kernel = functools.partial(
            _chained_kernel_int8_pipe,
            bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot, emit_i8=emit_i8,
            has_ds=has_ds,
        )
        scratch += [
            pltpu.VMEM((2, rows, cin), jnp.int8),   # double-buffered x rows
            pltpu.VMEM((2, rows, c4), out_dtype),   # double-buffered out rows
            pltpu.SemaphoreType.DMA((2,)),          # in-stream sems
            pltpu.SemaphoreType.DMA((2,)),          # out-stream sems
        ]

    if emit_mean:
        out_specs = pl.BlockSpec((bt, c4), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((b, c4), jnp.float32)
    elif pipe_dma:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct((b * hp * wp, c4), out_dtype)
    else:
        out_specs = pl.BlockSpec((rows, c4), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((b * hp * wp, c4), out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # manual/pipe DMA ping-pong requires sequential grid order
            dimension_semantics=(
                ("arbitrary",) if (manual_dma or pipe_dma) else ("parallel",)
            ),
            # Mosaic's default scoped-VMEM limit is 16 MB, which caps bt at 1
            # for the 56² shape (256 tiny grid steps whose per-step pipeline
            # overhead serializes against the HBM stream — see ROADMAP r3).
            # v5e VMEM is 128 MB; raising the cap lets bt grow.
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp
            * (cin * c + 9 * c * c + c * c4 + (cin * c4 if has_ds else 0)),
            bytes_accessed=b * hp * wp * (cin + c4)
            + (cin * c + 9 * c * c + c * c4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# PIXEL-PAIRED L1 chain kernel (int8).  At c=64 every dot of the standard
# chain kernel runs with N=64 — half the MXU's 128-lane output side idle —
# and the kw-interleave slots pad 64->128 lanes (K 192->384 with zero
# weight rows).  ROOFLINE.json (2026-08-20) localizes the engine's worst
# efficiency (0.18-0.30 of same-window floors) exactly in the L1 phases.
#
# Fix: put TWO W-adjacent pixels in each row — rows (bt*Hp*Wp/2, 2c=128).
# The relayout itself is FREE at every boundary because (N, C) -> (N/2, 2C)
# is row-major-contiguous: the HBM buffer is merely VIEWED differently
# (XLA reshape; adjacent pp blocks' reshape pairs cancel).  Inside the
# kernel NOTHING is repacked (the round-3 "paired two-kw-per-tile" attempt
# died on in-kernel int8 lane concats — the relayout trap): the pairing is
# carried by the WEIGHTS instead, built host-side —
#
#   conv1: block-diagonal (2cin, 128)  -> z1 comes out of the MXU already
#          paired.  2x the MACs (the MXU multiplies the zero block), but at
#          N=128 instead of N=64 the pass costs the SAME mxu-time as the
#          unpaired dot — the waste moves from lanes to an explicit zero
#          block, and buys the paired layout for free.
#   conv2: pair-space 3x3 — kw-interleave shifts whole PAIR rows (slot
#          width 2c == 128: DENSE, no padding) and the packed weight's
#          (128,128) blocks place each tap at the right (pair-offset,
#          parity) position: B[(kwp,pi,k),(kh,pj,j)] = W2[kh, 2(kwp-1)+
#          pi-pj+1, k, j] when that kw index is in range, else 0.  SAME
#          total MACs as the slot-padded unpaired dot, at N=128.
#   conv3 (+ projection): block-diagonal (128, 2*c4) -> output emerges
#          paired, which as a contiguous view IS the unpaired (rows, c4)
#          buffer.  Identity residual adds the paired x view directly
#          (cin == c4 for chain blocks).
#
# Net: +~30% MACs (conv1/conv3 zero blocks) against a ~2x N-side rate
# recovery on ALL dots plus halved VPU row counts (epilogues, interleave
# stores, masks all see half the rows at full lanes).
# ---------------------------------------------------------------------------


def _pick_bt_chain_int8_pp(b: int, hp: int, wpp: int, c2: int, cin2: int,
                           c4p: int) -> int:
    """Largest divisor of B whose pp chained working set fits the walk
    budget (the pp kernel has no measured bt table yet; the working-set
    model mirrors _pick_bt_chain_int8 in pair-space)."""
    budget = 40 * 2**20
    weights = cin2 * c2 + 9 * c2 * c2 + c2 * c4p

    def work(bt: int) -> int:
        rows = bt * hp * wpp
        return (
            2 * rows * cin2 * 1                  # x block (double-buffered)
            + (rows + 2 * wpp) * 3 * c2 * 1      # kw-interleaved z1 (dense)
            + (rows + 2 * wpp) * 3 * c2 * 4      # P (int32, stack)
            + rows * c2 * 4                      # acc2 fp32
            + rows * c2 * 4                      # mask f32
            + 2 * rows * c4p * 1                 # out block (double-buffered)
            + weights
        )

    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


def _chained_kernel_int8_pp(
    x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, w3_ref, b3_ref, mask_ref,
    sw1_ref, sw2p_ref, sw3_ref, s_ref,
    o_ref, z1_ref,
    *, bt, hp, wpp, c2, c4p, emit_i8,
    wd_ref=None, swd_ref=None, bd_ref=None,
):
    """Pixel-paired twin of _chained_kernel_int8 (see section comment).

    x_ref (rows_pp, 2*cin) int8 paired rows; w1 (2*cin, c2) block-diag;
    w2p (3*c2, 3*c2) pair-space packed 3x3; w3 (c2, c4p) block-diag;
    mask_ref (rows_pp, c2) f32 per-lane interior mask (left 64 lanes =
    even pixel, right 64 = odd — pad parity differs inside boundary
    pairs, so the mask is lane-varying here, not a (rows,1) broadcast).
    All scale/bias vectors are lane-tiled to pair width host-side.
    """
    rows = bt * hp * wpp
    s_res = s_ref[0]

    # --- conv1: paired rows x block-diag weights -> z1 already paired.
    z1 = jax.lax.dot_general(
        x_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z1 = jnp.maximum(
        z1.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
        + b1_ref[:].astype(jnp.float32),
        0.0,
    )
    z1 = z1 * mask_ref[:]
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

    # --- conv2 (pair-space 3x3): dense slots, no lane padding.
    _interleave_kw(z1_ref, z1, rows=rows, wp=wpp, slot=c2, width=c2)
    P = jax.lax.dot_general(
        z1_ref[:], w2p_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc2 = (
        jax.lax.slice(P, (0, 0), (rows, c2)).astype(jnp.float32)
        * sw2p_ref[0:1, :].astype(jnp.float32)
        + jax.lax.slice(P, (wpp, c2), (wpp + rows, 2 * c2)).astype(jnp.float32)
        * sw2p_ref[1:2, :].astype(jnp.float32)
        + jax.lax.slice(P, (2 * wpp, 2 * c2), (2 * wpp + rows, 3 * c2)).astype(
            jnp.float32
        )
        * sw2p_ref[2:3, :].astype(jnp.float32)
    )
    z2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32), 0.0)
    z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)

    # --- conv3 (+ residual/projection) in pair space, chunked.
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
        y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        if wd_ref is None:
            y = y + x_ref[lo : lo + chunk, :].astype(jnp.float32) * s_res
        else:
            sc = jax.lax.dot_general(
                x_ref[lo : lo + chunk, :], wd_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y + (
                sc.astype(jnp.float32) * swd_ref[:].astype(jnp.float32)
                + bd_ref[:].astype(jnp.float32)
            )
        y = jnp.maximum(y, 0.0)
        if emit_i8:
            o_ref[lo : lo + chunk, :] = jnp.clip(
                jnp.round(y), -127.0, 127.0
            ).astype(jnp.int8)
        else:
            o_ref[lo : lo + chunk, :] = y.astype(o_ref.dtype)


def _pp_pack_conv2(w2pq: jax.Array, c: int) -> jax.Array:
    """(3c,3c) kh-batched packed 3x3 (quantize_chain_block layout,
    [(kw,k),(kh,j)]) -> the pair-space (3*2c, 3*2c) packed weight
    [(kwp,pi,k),(kh,pj,j)].  Entries are COPIES of the already-quantized
    int8 values, so each output column (kh, pj, j) keeps the original
    per-(kh,j) scale — the lane-tiled sw2p stays exact."""
    w2r = w2pq.reshape(3, c, 3, c)  # (kw, k, kh, j)
    c2 = 2 * c
    out = jnp.zeros((3, 2, c, 3, 2, c), w2pq.dtype)  # (kwp,pi,k, kh,pj,j)
    for kwp in range(3):
        for pi in range(2):
            for pj in range(2):
                d = 2 * (kwp - 1) + pi - pj
                if -1 <= d <= 1:
                    # w2r[d+1] is (k, kh, j) — exactly the target slice's
                    # dim order (k, kh, j), all kh at once.
                    out = out.at[kwp, pi, :, :, pj, :].set(w2r[d + 1])
    return out.reshape(3 * c2, 3 * c2)


def _pp_block_diag(w: jax.Array) -> jax.Array:
    """(k, n) -> (2k, 2n) block-diagonal [[w, 0], [0, w]] (same dtype)."""
    k, n = w.shape
    z = jnp.zeros((k, n), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)],
        axis=0,
    )


def bottleneck_block_chained_int8_pp(
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
    wdq: jax.Array | None = None,
    swd: jax.Array | None = None,
    bd: jax.Array | None = None,
) -> jax.Array:
    """Pixel-paired stride-1 bottleneck chain block (c=64 / L1 shapes).

    SAME contract as bottleneck_block_chained_int8 — xq (B*Hp*Wp, cin)
    int8 chain rows in, same-layout (B*Hp*Wp, c4) out — the pairing is an
    internal view ((N, C) <-> (N/2, 2C) is contiguous, see section
    comment), so pp and standard blocks interoperate freely in a chain.
    Requires wp even (chain_meta gives wp=64 at the 56^2 L1 shape) and
    c == 64 (at c >= 128 the standard kernel's dots already fill the MXU
    N-side, and pairing would only add zero-block MACs).
    """
    c = w1q.shape[-1]
    cin = w1q.shape[0]
    c4 = w3q.shape[-1]
    has_ds = wdq is not None
    assert has_ds or cin == c4, (cin, c4)
    assert c == 64, f"pp kernel is for the c=64 (L1) stage only, got c={c}"
    hp, wp = chain_meta(0, h, w_sp)
    assert wp % 2 == 0, (wp, "pp pairing needs an even padded width")
    wpp = wp // 2
    c2, cin2, c4p = 2 * c, 2 * cin, 2 * c4
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == cin, (xq.shape, (b, hp, wp, cin))
    bt = bt or _pick_bt_chain_int8_pp(b, hp, wpp, c2, cin2, c4p)
    rows = bt * hp * wpp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16

    # Paired view: free on a contiguous row-major buffer.
    xpp = xq.reshape(total_rows // 2, cin2)

    # Pair-space weights (built from the standard quantized tensors; XLA
    # hoists these loop-invariant packs out of the serving loop).
    w1bd = _pp_block_diag(w1q)
    w2pp = _pp_pack_conv2(w2pq, c)
    w3bd = _pp_block_diag(w3q)

    # Host-side scale folding — identical factors to the standard wrapper,
    # lane-tiled to pair width.
    s_x, s_z1, s_z2 = scales[0], scales[1], scales[2]
    s_y = scales[3] if emit_i8 else jnp.float32(1.0)
    a1 = jnp.tile((sw1.astype(jnp.float32) * (s_x / s_z1)), 2)[None, :]
    c1 = jnp.tile((b1.astype(jnp.float32) * (1.0 / s_z1)), 2)[None, :]
    a2 = jnp.tile((sw2p.astype(jnp.float32) * (s_z1 / s_z2)).reshape(3, c),
                  (1, 2))
    c2v = jnp.tile((b2.astype(jnp.float32) * (1.0 / s_z2)), 2)[None, :]
    a3 = jnp.tile((sw3.astype(jnp.float32) * (s_z2 / s_y)), 2)[None, :]
    c3 = jnp.tile((b3.astype(jnp.float32) * (1.0 / s_y)), 2)[None, :]
    s_res = jnp.reshape(s_x / s_y, (1,)).astype(jnp.float32)

    # Lane-varying interior mask: pad parity differs inside boundary pairs.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_pp = jnp.repeat(mask.reshape(hp * wpp, 2), c, axis=1)  # (.., c2)
    mask_t = jnp.tile(mask_pp, (bt, 1))

    in_specs = [
        pl.BlockSpec((rows, cin2), lambda i: (i, 0)),
        pl.BlockSpec((cin2, c2), lambda i: (0, 0)),
        pl.BlockSpec((1, c2), lambda i: (0, 0)),
        pl.BlockSpec((3 * c2, 3 * c2), lambda i: (0, 0)),
        pl.BlockSpec((1, c2), lambda i: (0, 0)),
        pl.BlockSpec((c2, c4p), lambda i: (0, 0)),
        pl.BlockSpec((1, c4p), lambda i: (0, 0)),
        pl.BlockSpec((rows, c2), lambda i: (0, 0)),
        pl.BlockSpec((1, c2), lambda i: (0, 0)),
        pl.BlockSpec((3, c2), lambda i: (0, 0)),
        pl.BlockSpec((1, c4p), lambda i: (0, 0)),
    ]
    operands = [
        xpp, w1bd, c1, w2pp, c2v, w3bd, c3, mask_t,
        a1, a2, a3,
    ]
    if has_ds:
        wdbd = _pp_block_diag(wdq)
        ad = jnp.tile((swd.astype(jnp.float32) * (s_x / s_y)), 2)[None, :]
        cd = jnp.tile((bd.astype(jnp.float32) * (1.0 / s_y)), 2)[None, :]
        in_specs += [
            pl.BlockSpec((cin2, c4p), lambda i: (0, 0)),
            pl.BlockSpec((1, c4p), lambda i: (0, 0)),
            pl.BlockSpec((1, c4p), lambda i: (0, 0)),
        ]
        operands += [wdbd, ad, cd]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    operands.append(s_res)

    def kernel(*refs):
        x, w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3 = refs[:11]
        idx = 11
        wd = sd = bd_ = None
        if has_ds:
            wd, sd, bd_ = refs[idx : idx + 3]
            idx += 3
        s = refs[idx]
        o, z1 = refs[idx + 1], refs[idx + 2]
        _chained_kernel_int8_pp(
            x, w1, b1_, w2p, b2_, w3, b3_, msk, s1, s2p, s3, s, o, z1,
            bt=bt, hp=hp, wpp=wpp, c2=c2, c4p=c4p, emit_i8=emit_i8,
            wd_ref=wd, swd_ref=sd, bd_ref=bd_,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c4p), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp // 2, c4p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wpp, 3 * c2), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            # Pair-space MACs: conv1/conv3 (and ds) pay the 2x zero block.
            flops=2 * (b * hp * wp // 2)
            * (cin2 * c2 + 3 * (3 * c2) * c2 + c2 * c4p
               + (cin2 * c4p if has_ds else 0)),
            bytes_accessed=b * hp * wp * (cin + c4)
            + (cin2 * c2 + 9 * c2 * c2 + c2 * c4p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    # Back to the canonical chain shape (a free contiguous view).
    return out.reshape(b * hp * wp, c4)


def _pick_bt_run_int8_pp(b: int, hp: int, wpp: int, c2: int, cin2: int,
                         c4p: int, n_blocks: int) -> int:
    """Pair-space twin of _pick_bt_run_int8 (walk only; 0 = does not fit)."""
    budget = 56 * 2**20
    weights = n_blocks * (cin2 * c2 + 3 * c2 * 3 * c2 + c2 * c4p)

    def work(bt: int) -> int:
        rows = bt * hp * wpp
        return (
            2 * rows * cin2 * 1
            + 2 * rows * c4p * 1                 # act ping-pong
            + (rows + 2 * wpp) * 3 * c2 * 1
            + (rows + 2 * wpp) * 3 * c2 * 4
            + rows * c2 * 4
            + rows * c2 * 4                      # mask f32
            + 2 * rows * c4p * 1
            + weights
        )

    best = 0
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


def _run_chained_kernel_int8_pp(
    x_ref, w1s_ref, c1s_ref, w2ps_ref, c2s_ref, w3s_ref, c3s_ref, mask_ref,
    a1s_ref, a2s_ref, a3s_ref, s_ref,
    o_ref, z1_ref, act_ref,
    *, n_blocks, bt, hp, wpp, c2, cin2, c4p, emit_i8,
    w10_ref=None, wd_ref=None, ad_ref=None, cd_ref=None,
):
    """Pixel-paired twin of _run_chained_kernel_int8: N blocks over one
    VMEM-resident PAIRED activation (see the pp section comment).  Stacked
    pair-space params: w1s (N*c4p, c2) block-diag (or (N-1)*c4p with the
    proj form), w2ps (N*3*c2, 3*c2) pair-packed, w3s (N*c2, c4p)
    block-diag; scale/bias rows lane-tiled to pair width."""
    rows = bt * hp * wpp
    has_proj = w10_ref is not None

    for n in range(n_blocks):
        last = n == n_blocks - 1
        x_full = x_ref[:] if n == 0 else act_ref[(n - 1) % 2]

        if has_proj and n == 0:
            w1_n = w10_ref[:]
        elif has_proj:
            w1_n = w1s_ref[(n - 1) * c4p : n * c4p, :]
        else:
            w1_n = w1s_ref[n * c4p : (n + 1) * c4p, :]
        z1 = jax.lax.dot_general(
            x_full, w1_n,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        z1 = jnp.maximum(
            z1.astype(jnp.float32) * a1s_ref[n : n + 1, :].astype(jnp.float32)
            + c1s_ref[n : n + 1, :].astype(jnp.float32),
            0.0,
        )
        z1 = z1 * mask_ref[:]
        z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

        _interleave_kw(z1_ref, z1, rows=rows, wp=wpp, slot=c2, width=c2)

        P = jax.lax.dot_general(
            z1_ref[:], w2ps_ref[n * 3 * c2 : (n + 1) * 3 * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc2 = (
            jax.lax.slice(P, (0, 0), (rows, c2)).astype(jnp.float32)
            * a2s_ref[3 * n : 3 * n + 1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wpp, c2), (wpp + rows, 2 * c2)).astype(jnp.float32)
            * a2s_ref[3 * n + 1 : 3 * n + 2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wpp, 2 * c2), (2 * wpp + rows, 3 * c2)).astype(
                jnp.float32
            )
            * a2s_ref[3 * n + 2 : 3 * n + 3, :].astype(jnp.float32)
        )
        z2 = jnp.maximum(acc2 + c2s_ref[n : n + 1, :].astype(jnp.float32), 0.0)
        z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)

        s_res = s_ref[n]
        chunk = rows
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, rows, chunk):
            y = jax.lax.dot_general(
                jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
                w3s_ref[n * c2 : (n + 1) * c2, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * a3s_ref[n : n + 1, :].astype(jnp.float32)
            y = y + c3s_ref[n : n + 1, :].astype(jnp.float32)
            if has_proj and n == 0:
                sc = jax.lax.dot_general(
                    x_ref[lo : lo + chunk, :], wd_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = y + (
                    sc.astype(jnp.float32) * ad_ref[:].astype(jnp.float32)
                    + cd_ref[:].astype(jnp.float32)
                )
            else:
                if n == 0:
                    res = x_ref[lo : lo + chunk, :]
                else:
                    res = act_ref[(n - 1) % 2, lo : lo + chunk, :]
                y = y + res.astype(jnp.float32) * s_res
            y = jnp.maximum(y, 0.0)
            if last and not emit_i8:
                o_ref[lo : lo + chunk, :] = y.astype(o_ref.dtype)
            else:
                yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
                if last:
                    o_ref[lo : lo + chunk, :] = yq
                else:
                    act_ref[n % 2, lo : lo + chunk, :] = yq


@functools.partial(
    jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret")
)
def bottleneck_run_chained_int8_pp(
    xq: jax.Array,
    w1q_s: jax.Array, sw1_s: jax.Array, b1_s: jax.Array,
    w2pq_s: jax.Array, sw2p_s: jax.Array, b2_s: jax.Array,
    w3q_s: jax.Array, sw3_s: jax.Array, b3_s: jax.Array,
    scales_s: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
    w1q0: jax.Array | None = None,
    wdq: jax.Array | None = None,
    swd: jax.Array | None = None,
    bd: jax.Array | None = None,
) -> jax.Array:
    """Pixel-paired run of N bottleneck blocks as ONE kernel — the pp twin
    of bottleneck_run_chained_int8 (same stacked-input contract; c=64 only).
    Stacks the two measured wins: run-fusion's removed inter-block HBM
    round trips (1.14x at L1, PERF round 3) and pp's N=128 dots."""
    has_proj = w1q0 is not None
    if has_proj:
        n_m1, c4, c = w1q_s.shape
        n_blocks = n_m1 + 1
        cin = w1q0.shape[0]
        assert wdq is not None and wdq.shape == (cin, c4), (wdq,)
    else:
        n_blocks, c4, c = w1q_s.shape
        cin = c4
    assert c == 64, f"pp run kernel is for the c=64 (L1) stage only, got {c}"
    hp, wp = chain_meta(0, h, w_sp)
    assert wp % 2 == 0, (wp,)
    wpp = wp // 2
    c2, cin2, c4p = 2 * c, 2 * cin, 2 * c4
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == cin, (xq.shape,)
    bt = bt or _pick_bt_run_int8_pp(b, hp, wpp, c2, cin2, c4p, n_blocks)
    assert bt > 0, "pp stage run does not fit VMEM; use per-block pp kernels"
    rows = bt * hp * wpp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16

    xpp = xq.reshape(total_rows // 2, cin2)

    # Pair-space stacked weights.
    w1bd_s = jnp.concatenate(
        [_pp_block_diag(w1q_s[i]) for i in range(w1q_s.shape[0])], axis=0
    )  # ((N or N-1)*c4p, c2)
    w2pp_s = jnp.concatenate(
        [_pp_pack_conv2(w2pq_s[i], c) for i in range(n_blocks)], axis=0
    )  # (N*3*c2, 3*c2)
    w3bd_s = jnp.concatenate(
        [_pp_block_diag(w3q_s[i]) for i in range(n_blocks)], axis=0
    )  # (N*c2, c4p)

    # Host-side per-block scale folding, lane-tiled (same factors as the
    # std run wrapper; last block's s_y = 1 on bf16 exit).
    s_x = scales_s[:, 0]
    s_z1 = scales_s[:, 1]
    s_z2 = scales_s[:, 2]
    s_y = scales_s[:, 3]
    if not emit_i8:
        s_y = s_y.at[n_blocks - 1].set(1.0)
    t2 = lambda v: jnp.tile(v, (1, 2))
    a1s = t2(sw1_s.astype(jnp.float32) * (s_x / s_z1)[:, None])
    c1s = t2(b1_s.astype(jnp.float32) * (1.0 / s_z1)[:, None])
    a2s = jnp.tile(
        (sw2p_s.astype(jnp.float32)
         * (s_z1 / s_z2)[:, None]).reshape(n_blocks * 3, c),
        (1, 2),
    )
    c2s = t2(b2_s.astype(jnp.float32) * (1.0 / s_z2)[:, None])
    a3s = t2(sw3_s.astype(jnp.float32) * (s_z2 / s_y)[:, None])
    c3s = t2(b3_s.astype(jnp.float32) * (1.0 / s_y)[:, None])
    s_run = (s_x / s_y).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_pp = jnp.repeat(mask.reshape(hp * wpp, 2), c, axis=1)
    mask_t = jnp.tile(mask_pp, (bt, 1))

    nw1 = w1bd_s.shape[0]
    in_specs = [
        pl.BlockSpec((rows, cin2), lambda i: (i, 0)),
        pl.BlockSpec((nw1, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * 3 * c2, 3 * c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * c2, c4p), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c4p), lambda i: (0, 0)),
        pl.BlockSpec((rows, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * 3, c2), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c4p), lambda i: (0, 0)),
    ]
    operands = [
        xpp, w1bd_s, c1s, w2pp_s, c2s, w3bd_s, c3s, mask_t,
        a1s, a2s, a3s,
    ]
    if has_proj:
        w10bd = _pp_block_diag(w1q0)
        wdbd = _pp_block_diag(wdq)
        ad = jnp.tile((swd.astype(jnp.float32) * (s_x[0] / s_y[0])), 2)[None, :]
        cd = jnp.tile((bd.astype(jnp.float32) * (1.0 / s_y[0])), 2)[None, :]
        in_specs += [
            pl.BlockSpec((cin2, c2), lambda i: (0, 0)),
            pl.BlockSpec((cin2, c4p), lambda i: (0, 0)),
            pl.BlockSpec((1, c4p), lambda i: (0, 0)),
            pl.BlockSpec((1, c4p), lambda i: (0, 0)),
        ]
        operands += [w10bd, wdbd, ad, cd]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    operands.append(s_run)

    def kernel(*refs):
        x, w1s, c1s_, w2ps, c2s_, w3s, c3s_, msk, a1, a2, a3 = refs[:11]
        idx = 11
        w10 = wd = ad_ = cd_ = None
        if has_proj:
            w10, wd, ad_, cd_ = refs[idx : idx + 4]
            idx += 4
        s = refs[idx]
        o, z1, act = refs[idx + 1], refs[idx + 2], refs[idx + 3]
        _run_chained_kernel_int8_pp(
            x, w1s, c1s_, w2ps, c2s_, w3s, c3s_, msk, a1, a2, a3, s,
            o, z1, act,
            n_blocks=n_blocks, bt=bt, hp=hp, wpp=wpp, c2=c2, cin2=cin2,
            c4p=c4p, emit_i8=emit_i8,
            w10_ref=w10, wd_ref=wd, ad_ref=ad_, cd_ref=cd_,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c4p), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp // 2, c4p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wpp, 3 * c2), jnp.int8),
            pltpu.VMEM((2, rows, c4p), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * hp * wp // 2)
            * (n_blocks * (c4p * c2 + 3 * (3 * c2) * c2 + c2 * c4p)
               + (cin2 * c4p if has_proj else 0)),
            bytes_accessed=b * hp * wp * (cin + c4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b * hp * wp, c4)


# ---------------------------------------------------------------------------
# BASIC-block megakernel (int8): one stride-1 BasicBlock (ResNet-18/34) as
# ONE kernel over the chained padded-row layout — two 3x3 convs, both via
# the kw-interleave machinery the bottleneck kernel uses for its conv2.
# Completes the int8_chain backend's coverage of the reference's model
# family (main.cu builds 18/34 from the same ResnetBlock graph it uses for
# 50/101/152).  Unlike the bottleneck kernel (whose 1x1 conv1 + mask
# launders the chain ring's garbage before any 3x3 sees it), conv1 here IS
# a 3x3 reading x directly, so x is masked on the way into the interleave
# scratch (the chain contract leaves garbage in border rows between
# kernels).
# ---------------------------------------------------------------------------


def _basic_chained_kernel_int8(
    x_ref, w1p_ref, c1_ref, w2p_ref, c2_ref, mask_ref,
    a1_ref, a2_ref, s_ref,
    o_ref, il_ref,
    *, bt, hp, wp, c, slot, emit_i8,
):
    """x_ref (rows, c) int8 at scale s_x (cin == c for every stride-1
    basic block); w1p/w2p the kh-batched packed 3x3s ((kw,k) x (kh,j) —
    quantize_basic_block); a1/a2 (3, c) the host-folded per-(kh,j) dequant
    scales (a1 := sw1p*s_x/s_z1, c1 := b1/s_z1, a2 := sw2p*s_z1/s_y,
    c2 := b2/s_y); s_ref (SMEM, (1,)) the identity-residual scale s_x/s_y.
    il_ref is ONE interleave scratch reused for both convs.
    """
    rows = bt * hp * wp
    s_res = s_ref[0]

    def interleave(vals):
        _interleave_kw(il_ref, vals, rows=rows, wp=wp, slot=slot, width=c)

    def conv3x3(wp_ref, a_ref):
        P = jax.lax.dot_general(
            il_ref[:], wp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
            * a_ref[0:1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
            * a_ref[1:2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)).astype(
                jnp.float32
            )
            * a_ref[2:3, :].astype(jnp.float32)
        )

    # conv1 (3x3, c -> c): mask x (chain ring garbage must not enter a
    # 3x3), interleave, one kh-batched dot, fused dequant+bias+relu+mask.
    xm = jnp.where(mask_ref[:] > 0.0, x_ref[:], jnp.int8(0))
    interleave(xm)
    z1 = jnp.maximum(conv3x3(w1p_ref, a1_ref) + c1_ref[:].astype(jnp.float32), 0.0)
    z1 = z1 * mask_ref[:]
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

    # conv2 (3x3, c -> c) + identity residual + ReLU.
    interleave(z1)
    y = conv3x3(w2p_ref, a2_ref) + c2_ref[:].astype(jnp.float32)
    y = y + x_ref[:].astype(jnp.float32) * s_res
    y = jnp.maximum(y, 0.0)
    if emit_i8:
        o_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        o_ref[:] = y.astype(o_ref.dtype)


def _pick_bt_basic_int8(b: int, hp: int, wp: int, c: int) -> int:
    """Largest divisor of B whose basic-chain working set fits the VMEM
    budget (measured tables TBD on chip; the walk mirrors the bottleneck
    picker's accounting)."""
    budget = 40 * 2**20
    slot = _round_up(c, 128)
    weights = 2 * 9 * c * c

    def work(bt: int) -> int:
        rows = bt * hp * wp
        return (
            2 * rows * c * 1                    # x block (double-buffered)
            + (rows + 2 * wp) * 3 * slot * 1    # interleave scratch (reused)
            + (rows + 2 * wp) * 3 * c * 4       # P (int32)
            + rows * c * 4                      # acc fp32
            + 2 * rows * c * 1                  # out block (double-buffered)
            + weights
        )

    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


@functools.partial(
    jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret")
)
def basic_block_chained_int8(
    xq: jax.Array,
    w1pq: jax.Array, sw1p: jax.Array, b1: jax.Array,
    w2pq: jax.Array, sw2p: jax.Array, b2: jax.Array,
    scales: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Int8 stride-1 BasicBlock over the chained padded-row layout.

    xq: (B*Hp*Wp, c) int8 rows at scale scales[0]; w1pq/w2pq (3c, 3c) the
    kh-batched packed 3x3s with per-(kh, j) column scales sw1p/sw2p (3c,);
    biases f32.  scales: (3,) f32 = [s_x, s_z1, s_y].  Output is the same
    padded-row layout, int8 at s_y when emit_i8 else bf16 (chain exit).
    Reference capability: the k=3 branch of ResnetBlock (main.cu:18-46) at
    expansion 1 — the ResNet-18/34 building block.
    """
    c = sw1p.shape[-1] // 3
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == c, (xq.shape, c)
    bt = bt or _pick_bt_basic_int8(b, hp, wp, c)

    rows = bt * hp * wp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    slot = _round_up(c, 128)

    def pad_slots(wq):
        if slot == c:
            return wq
        return jnp.pad(
            wq.reshape(3, c, 3 * c), ((0, 0), (0, slot - c), (0, 0))
        ).reshape(3 * slot, 3 * c)

    s_x, s_z1 = scales[0], scales[1]
    s_y = scales[2] if emit_i8 else jnp.float32(1.0)
    a1 = (sw1p.astype(jnp.float32) * (s_x / s_z1)).reshape(3, c)
    c1 = (b1.astype(jnp.float32) * (1.0 / s_z1))[None, :]
    a2 = (sw2p.astype(jnp.float32) * (s_z1 / s_y)).reshape(3, c)
    c2 = (b2.astype(jnp.float32) * (1.0 / s_y))[None, :]
    s_res = jnp.reshape(s_x / s_y, (1,)).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_t = jnp.tile(mask, (bt, 1))

    return pl.pallas_call(
        functools.partial(
            _basic_chained_kernel_int8,
            bt=bt, hp=hp, wp=wp, c=c, slot=slot, emit_i8=emit_i8,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((3 * slot, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3 * slot, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((rows, 1), lambda i: (0, 0)),
            pl.BlockSpec((3, c), lambda i: (0, 0)),
            pl.BlockSpec((3, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * slot), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * 18 * c * c,
            bytes_accessed=2 * b * hp * wp * c + 18 * c * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xq, pad_slots(w1pq), c1, pad_slots(w2pq), c2, mask_t, a1, a2, s_res
    )


def _run_basic_kernel_int8(
    x_ref, w1ps_ref, c1s_ref, w2ps_ref, c2s_ref, mask_ref,
    a1s_ref, a2s_ref, s_ref,
    o_ref, il_ref, act_ref,
    *, n_blocks, bt, hp, wp, c, slot, emit_i8,
):
    """N stride-1 BasicBlocks over one VMEM-resident activation (the basic
    twin of _run_chained_kernel_int8).  Stacked per-block params: w1ps/w2ps
    (N*3*slot, 3c) int8 packed 3x3s; c1s/c2s (N, c), a1s/a2s (N*3, c) f32
    host-folded; s_ref (SMEM, (N,)) per-block identity-residual scales.
    act_ref (2, rows, c) int8 ping-pong.  Every block masks its input
    before the 3x3 interleave — both the HBM x and our own act buffers
    carry chain-ring garbage in border rows."""
    rows = bt * hp * wp

    for n in range(n_blocks):
        last = n == n_blocks - 1
        x_full = x_ref[:] if n == 0 else act_ref[(n - 1) % 2]

        def conv3x3(ws_ref, as_ref):
            P = jax.lax.dot_general(
                il_ref[:],
                ws_ref[n * 3 * slot : (n + 1) * 3 * slot, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
                * as_ref[3 * n : 3 * n + 1, :].astype(jnp.float32)
                + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
                * as_ref[3 * n + 1 : 3 * n + 2, :].astype(jnp.float32)
                + jax.lax.slice(
                    P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)
                ).astype(jnp.float32)
                * as_ref[3 * n + 2 : 3 * n + 3, :].astype(jnp.float32)
            )

        xm = jnp.where(mask_ref[:] > 0.0, x_full, jnp.int8(0))
        _interleave_kw(il_ref, xm, rows=rows, wp=wp, slot=slot, width=c)
        z1 = jnp.maximum(
            conv3x3(w1ps_ref, a1s_ref)
            + c1s_ref[n : n + 1, :].astype(jnp.float32),
            0.0,
        )
        z1 = z1 * mask_ref[:]
        z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

        _interleave_kw(il_ref, z1, rows=rows, wp=wp, slot=slot, width=c)
        y = conv3x3(w2ps_ref, a2s_ref) + c2s_ref[n : n + 1, :].astype(jnp.float32)
        y = y + x_full.astype(jnp.float32) * s_ref[n]
        y = jnp.maximum(y, 0.0)
        if last and not emit_i8:
            o_ref[:] = y.astype(o_ref.dtype)
        else:
            yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
            if last:
                o_ref[:] = yq
            else:
                act_ref[n % 2, :, :] = yq


def _pick_bt_basic_run_int8(
    b: int, hp: int, wp: int, c: int, n_blocks: int
) -> int:
    """Largest divisor of B whose basic-run working set fits VMEM (0 if even
    bt=1 does not fit — the caller falls back to per-block kernels).
    Measured tables TBD on chip."""
    budget = 56 * 2**20
    slot = _round_up(c, 128)
    weights = n_blocks * 2 * 3 * slot * 3 * c

    def work(bt: int) -> int:
        rows = bt * hp * wp
        return (
            2 * rows * c * 1                    # x block (double-buffered)
            + 2 * rows * c * 1                  # act ping-pong
            + (rows + 2 * wp) * 3 * slot * 1    # interleave scratch
            + (rows + 2 * wp) * 3 * c * 4       # P (int32)
            + rows * c * 4                      # acc fp32
            + 2 * rows * c * 1                  # out block (double-buffered)
            + weights
        )

    best = 0
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


@functools.partial(
    jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret")
)
def basic_run_chained_int8(
    xq: jax.Array,
    w1pq_s: jax.Array, sw1p_s: jax.Array, b1_s: jax.Array,
    w2pq_s: jax.Array, sw2p_s: jax.Array, b2_s: jax.Array,
    scales_s: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """A run of N stride-1 BasicBlocks as ONE kernel (see
    _run_basic_kernel_int8).  Stacked inputs: w1pq_s/w2pq_s (N, 3c, 3c),
    sw1p_s/sw2p_s (N, 3c), b1_s/b2_s (N, c); scales_s (N, 3) rows
    [s_x, s_z1, s_y] with row i's s_y equal to row i+1's s_x."""
    n_blocks = w1pq_s.shape[0]
    c = sw1p_s.shape[-1] // 3
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == c, (xq.shape, c)
    bt = bt or _pick_bt_basic_run_int8(b, hp, wp, c, n_blocks)
    assert bt > 0, "basic run does not fit VMEM; use per-block kernels"

    rows = bt * hp * wp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    slot = _round_up(c, 128)

    def pad_slots(wq_s):
        if slot == c:
            return wq_s.reshape(n_blocks * 3 * c, 3 * c)
        return jnp.pad(
            wq_s.reshape(n_blocks, 3, c, 3 * c),
            ((0, 0), (0, 0), (0, slot - c), (0, 0)),
        ).reshape(n_blocks * 3 * slot, 3 * c)

    s_x = scales_s[:, 0]
    s_z1 = scales_s[:, 1]
    s_y = scales_s[:, 2]
    if not emit_i8:
        s_y = s_y.at[n_blocks - 1].set(1.0)
    a1 = (sw1p_s.astype(jnp.float32) * (s_x / s_z1)[:, None]).reshape(
        n_blocks * 3, c
    )
    c1 = b1_s.astype(jnp.float32) * (1.0 / s_z1)[:, None]
    a2 = (sw2p_s.astype(jnp.float32) * (s_z1 / s_y)[:, None]).reshape(
        n_blocks * 3, c
    )
    c2 = b2_s.astype(jnp.float32) * (1.0 / s_y)[:, None]
    s_res = (s_x / s_y).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_t = jnp.tile(mask, (bt, 1))

    return pl.pallas_call(
        functools.partial(
            _run_basic_kernel_int8,
            n_blocks=n_blocks, bt=bt, hp=hp, wp=wp, c=c, slot=slot,
            emit_i8=emit_i8,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((n_blocks * 3 * slot, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks, c), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3 * slot, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks, c), lambda i: (0, 0)),
            pl.BlockSpec((rows, 1), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3, c), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wp, 3 * slot), jnp.int8),
            pltpu.VMEM((2, rows, c), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * wp * n_blocks * 18 * c * c,
            bytes_accessed=2 * b * hp * wp * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xq, pad_slots(w1pq_s), c1, pad_slots(w2pq_s), c2, mask_t, a1, a2, s_res
    )


def _basic_chained_kernel_int8_pp(
    x_ref, w1p_ref, c1_ref, w2p_ref, c2_ref, mask_ref,
    a1_ref, a2_ref, s_ref,
    o_ref, il_ref,
    *, bt, hp, wpp, c2, emit_i8,
):
    """Pixel-paired twin of _basic_chained_kernel_int8 (c=64 / the basic
    family's L1): both 3x3s run in pair space with dense slots and N=128
    dots (see the bottleneck pp section comment — same construction, the
    conv1-is-a-3x3 difference means x is masked INTO the interleave).
    mask_ref (rows_pp, c2) f32 lane-varying (pad parity differs inside
    boundary pairs)."""
    rows = bt * hp * wpp
    s_res = s_ref[0]

    def interleave(vals):
        _interleave_kw(il_ref, vals, rows=rows, wp=wpp, slot=c2, width=c2)

    def conv3x3(wp_ref, a_ref):
        P = jax.lax.dot_general(
            il_ref[:], wp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            jax.lax.slice(P, (0, 0), (rows, c2)).astype(jnp.float32)
            * a_ref[0:1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wpp, c2), (wpp + rows, 2 * c2)).astype(jnp.float32)
            * a_ref[1:2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wpp, 2 * c2), (2 * wpp + rows, 3 * c2)).astype(
                jnp.float32
            )
            * a_ref[2:3, :].astype(jnp.float32)
        )

    xm = jnp.where(mask_ref[:] > 0.0, x_ref[:], jnp.int8(0))
    interleave(xm)
    z1 = jnp.maximum(conv3x3(w1p_ref, a1_ref) + c1_ref[:].astype(jnp.float32), 0.0)
    z1 = z1 * mask_ref[:]
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

    interleave(z1)
    y = conv3x3(w2p_ref, a2_ref) + c2_ref[:].astype(jnp.float32)
    y = y + x_ref[:].astype(jnp.float32) * s_res
    y = jnp.maximum(y, 0.0)
    if emit_i8:
        o_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    else:
        o_ref[:] = y.astype(o_ref.dtype)


def _pick_bt_basic_int8_pp(b: int, hp: int, wpp: int, c2: int) -> int:
    """Pair-space working-set walk for the pp basic kernel."""
    budget = 40 * 2**20

    def work(bt: int) -> int:
        rows = bt * hp * wpp
        return (
            2 * rows * c2 * 1
            + (rows + 2 * wpp) * 3 * c2 * 1
            + (rows + 2 * wpp) * 3 * c2 * 4
            + rows * c2 * 4
            + rows * c2 * 4
            + 2 * rows * c2 * 1
            + 2 * 9 * c2 * c2
        )

    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


def basic_block_chained_int8_pp(
    xq: jax.Array,
    w1pq: jax.Array, sw1p: jax.Array, b1: jax.Array,
    w2pq: jax.Array, sw2p: jax.Array, b2: jax.Array,
    scales: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pixel-paired stride-1 BasicBlock (c=64 / L1 shapes).  SAME contract
    as basic_block_chained_int8 — the pairing is an internal contiguous
    view; pp and standard basic blocks interoperate freely in a chain."""
    c = sw1p.shape[-1] // 3
    assert c == 64, f"pp basic kernel is for the c=64 stage only, got {c}"
    hp, wp = chain_meta(0, h, w_sp)
    assert wp % 2 == 0, (wp,)
    wpp = wp // 2
    c2 = 2 * c
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == c, (xq.shape, c)
    bt = bt or _pick_bt_basic_int8_pp(b, hp, wpp, c2)
    rows = bt * hp * wpp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16

    xpp = xq.reshape(total_rows // 2, c2)
    w1pp = _pp_pack_conv2(w1pq, c)
    w2pp = _pp_pack_conv2(w2pq, c)

    s_x, s_z1 = scales[0], scales[1]
    s_y = scales[2] if emit_i8 else jnp.float32(1.0)
    a1 = jnp.tile((sw1p.astype(jnp.float32) * (s_x / s_z1)).reshape(3, c),
                  (1, 2))
    c1 = jnp.tile((b1.astype(jnp.float32) * (1.0 / s_z1)), 2)[None, :]
    a2 = jnp.tile((sw2p.astype(jnp.float32) * (s_z1 / s_y)).reshape(3, c),
                  (1, 2))
    c2v = jnp.tile((b2.astype(jnp.float32) * (1.0 / s_y)), 2)[None, :]
    s_res = jnp.reshape(s_x / s_y, (1,)).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_pp = jnp.repeat(mask.reshape(hp * wpp, 2), c, axis=1)
    mask_t = jnp.tile(mask_pp, (bt, 1))

    out = pl.pallas_call(
        functools.partial(
            _basic_chained_kernel_int8_pp,
            bt=bt, hp=hp, wpp=wpp, c2=c2, emit_i8=emit_i8,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c2), lambda i: (i, 0)),
            pl.BlockSpec((3 * c2, 3 * c2), lambda i: (0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
            pl.BlockSpec((3 * c2, 3 * c2), lambda i: (0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
            pl.BlockSpec((rows, c2), lambda i: (0, 0)),
            pl.BlockSpec((3, c2), lambda i: (0, 0)),
            pl.BlockSpec((3, c2), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp // 2, c2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wpp, 3 * c2), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * hp * wp // 2) * 2 * (3 * c2) * c2 * 3,
            bytes_accessed=2 * b * hp * wp * c + 2 * 9 * c2 * c2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xpp, w1pp, c1, w2pp, c2v, mask_t, a1, a2, s_res
    )
    return out.reshape(b * hp * wp, c)


def _run_basic_kernel_int8_pp(
    x_ref, w1ps_ref, c1s_ref, w2ps_ref, c2s_ref, mask_ref,
    a1s_ref, a2s_ref, s_ref,
    o_ref, il_ref, act_ref,
    *, n_blocks, bt, hp, wpp, c2, emit_i8,
):
    """Pixel-paired twin of _run_basic_kernel_int8: N basic blocks over one
    VMEM-resident PAIRED activation."""
    rows = bt * hp * wpp

    def interleave(vals):
        _interleave_kw(il_ref, vals, rows=rows, wp=wpp, slot=c2, width=c2)

    def conv3x3(n, wps_ref, as_ref):
        P = jax.lax.dot_general(
            il_ref[:], wps_ref[n * 3 * c2 : (n + 1) * 3 * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            jax.lax.slice(P, (0, 0), (rows, c2)).astype(jnp.float32)
            * as_ref[3 * n : 3 * n + 1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wpp, c2), (wpp + rows, 2 * c2)).astype(jnp.float32)
            * as_ref[3 * n + 1 : 3 * n + 2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wpp, 2 * c2), (2 * wpp + rows, 3 * c2)).astype(
                jnp.float32
            )
            * as_ref[3 * n + 2 : 3 * n + 3, :].astype(jnp.float32)
        )

    for n in range(n_blocks):
        last = n == n_blocks - 1
        x_full = x_ref[:] if n == 0 else act_ref[(n - 1) % 2]

        xm = jnp.where(mask_ref[:] > 0.0, x_full, jnp.int8(0))
        interleave(xm)
        z1 = jnp.maximum(
            conv3x3(n, w1ps_ref, a1s_ref)
            + c1s_ref[n : n + 1, :].astype(jnp.float32),
            0.0,
        )
        z1 = z1 * mask_ref[:]
        z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

        interleave(z1)
        y = conv3x3(n, w2ps_ref, a2s_ref) + c2s_ref[n : n + 1, :].astype(
            jnp.float32
        )
        y = y + x_full.astype(jnp.float32) * s_ref[n]
        y = jnp.maximum(y, 0.0)
        if last and not emit_i8:
            o_ref[:] = y.astype(o_ref.dtype)
        else:
            yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
            if last:
                o_ref[:] = yq
            else:
                act_ref[n % 2] = yq


def _pick_bt_basic_run_int8_pp(b: int, hp: int, wpp: int, c2: int,
                               n_blocks: int) -> int:
    """Pair-space walk for the pp basic run kernel (0 = does not fit)."""
    budget = 56 * 2**20

    def work(bt: int) -> int:
        rows = bt * hp * wpp
        return (
            2 * rows * c2 * 1
            + 2 * rows * c2 * 1
            + (rows + 2 * wpp) * 3 * c2 * 1
            + (rows + 2 * wpp) * 3 * c2 * 4
            + rows * c2 * 4
            + rows * c2 * 4
            + 2 * rows * c2 * 1
            + n_blocks * 2 * 9 * c2 * c2
        )

    best = 0
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


def basic_run_chained_int8_pp(
    xq: jax.Array,
    w1pq_s: jax.Array, sw1p_s: jax.Array, b1_s: jax.Array,
    w2pq_s: jax.Array, sw2p_s: jax.Array, b2_s: jax.Array,
    scales_s: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pixel-paired run of N stride-1 BasicBlocks as ONE kernel (the pp
    twin of basic_run_chained_int8; same stacked-input contract, c=64)."""
    n_blocks = w1pq_s.shape[0]
    c = sw1p_s.shape[-1] // 3
    assert c == 64, f"pp basic run is for the c=64 stage only, got {c}"
    hp, wp = chain_meta(0, h, w_sp)
    assert wp % 2 == 0, (wp,)
    wpp = wp // 2
    c2 = 2 * c
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == c, (xq.shape, c)
    bt = bt or _pick_bt_basic_run_int8_pp(b, hp, wpp, c2, n_blocks)
    assert bt > 0, "pp basic run does not fit VMEM; use per-block pp kernels"
    rows = bt * hp * wpp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16

    xpp = xq.reshape(total_rows // 2, c2)
    w1pp_s = jnp.concatenate(
        [_pp_pack_conv2(w1pq_s[i], c) for i in range(n_blocks)], axis=0
    )
    w2pp_s = jnp.concatenate(
        [_pp_pack_conv2(w2pq_s[i], c) for i in range(n_blocks)], axis=0
    )

    s_x = scales_s[:, 0]
    s_z1 = scales_s[:, 1]
    s_y = scales_s[:, 2]
    if not emit_i8:
        s_y = s_y.at[n_blocks - 1].set(1.0)
    a1 = jnp.tile(
        (sw1p_s.astype(jnp.float32) * (s_x / s_z1)[:, None]).reshape(
            n_blocks * 3, c
        ),
        (1, 2),
    )
    c1 = jnp.tile(b1_s.astype(jnp.float32) * (1.0 / s_z1)[:, None], (1, 2))
    a2 = jnp.tile(
        (sw2p_s.astype(jnp.float32) * (s_z1 / s_y)[:, None]).reshape(
            n_blocks * 3, c
        ),
        (1, 2),
    )
    c2v = jnp.tile(b2_s.astype(jnp.float32) * (1.0 / s_y)[:, None], (1, 2))
    s_run = (s_x / s_y).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_pp = jnp.repeat(mask.reshape(hp * wpp, 2), c, axis=1)
    mask_t = jnp.tile(mask_pp, (bt, 1))

    out = pl.pallas_call(
        functools.partial(
            _run_basic_kernel_int8_pp,
            n_blocks=n_blocks, bt=bt, hp=hp, wpp=wpp, c2=c2, emit_i8=emit_i8,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c2), lambda i: (i, 0)),
            pl.BlockSpec((n_blocks * 3 * c2, 3 * c2), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks, c2), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3 * c2, 3 * c2), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks, c2), lambda i: (0, 0)),
            pl.BlockSpec((rows, c2), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3, c2), lambda i: (0, 0)),
            pl.BlockSpec((n_blocks * 3, c2), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp * wp // 2, c2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * wpp, 3 * c2), jnp.int8),
            pltpu.VMEM((2, rows, c2), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * hp * wp // 2) * n_blocks * 2 * (3 * c2) * c2 * 3,
            bytes_accessed=2 * b * hp * wp * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xpp, w1pp_s, c1, w2pp_s, c2v, mask_t, a1, a2, s_run
    )
    return out.reshape(b * hp * wp, c)


def quantize_basic_block(blk: dict) -> dict:
    """Quantize one BN-folded BasicBlock for the int8 basic chain kernel:
    both 3x3s packed kh-batched ((kw,k) x (kh,j)) with per-(kh,j) column
    scales — the same packing quantize_chain_block applies to the
    bottleneck's conv2."""
    from resnetc_tpu.ops.pallas.quant import quantize_per_channel

    out = {}
    for name in ("conv1", "conv2"):
        w = blk[name]["weight"]
        c = w.shape[-1]
        wpk = jnp.transpose(w, (1, 2, 0, 3)).reshape(3 * w.shape[2], 3 * c)
        wq, sw = quantize_per_channel(wpk)
        key = "1" if name == "conv1" else "2"
        out[f"w{key}pq"] = wq
        out[f"sw{key}p"] = sw
        out[f"b{key}"] = blk[name]["bias"]
    return out


# ---------------------------------------------------------------------------
# Stride-2 BASIC transition megakernel (int8): the whole ResNet-18/34 stage
# transition (conv3x3/2 + conv3x3 + 1x1/2 projection shortcut) as ONE
# kernel, chain layout to chain layout.  Reference capability: the stride-2
# branch of ResnetBlock at expansion 1 (main.cu:18-46, 71-76).
#
# Structure (every piece is a chip-proven pattern from the bottleneck ds /
# basic s1 kernels):
#   - input gather: TWO ph-pair strided DMAs (the pair_dma pattern — coarse
#     wq*2*cin-byte runs; the pw pair stays interleaved in lanes),
#   - conv1 (3x3 s2): three tap dots over a [pair | pair-shifted-one-row]
#     slot scratch (K = 4*cin, every slot boundary 2*cin-aligned so cin=64
#     works too); tap weights zero the unused pw half, so the only padding
#     tax is conv1's v=2 tap (+1/3 of conv1's FLOPs),
#   - z1 is scattered per image into a chain-layout VMEM scratch (compact
#     conv row u -> chain row u + wp2 + 1 — the ds conv3 store mapping),
#   - conv2 (3x3 s1): the basic kernel's masked kw-interleave + kh-batched
#     single dot on the OUTPUT geometry,
#   - shortcut: per-image dots of the raw ph=1 pair against [0; wd] (the
#     zero top half kills the pw=0 lanes - plane (1,1) is x[2r, 2c]).
# ---------------------------------------------------------------------------


def basic_ds_geometry(
    h: int, w_sp: int
) -> tuple[int, int, int, int, bool]:
    """(hq, wq, hp2, wp2, direct) for the basic-ds megakernel — the single
    source of truth shared by basic_ds_block_s2_int8 and its VMEM-fit
    guard in fused.py (same conditions as the bottleneck ds kernel)."""
    hp, wp = chain_meta(0, h, w_sp)
    oh, ow = (h + 1) // 2, (w_sp + 1) // 2
    hp2, wp2 = chain_meta(0, oh, ow)
    hq, wq = hp // 2, wp // 2
    direct = hp % 2 == 0 and wp % 2 == 0 and wq == wp2 and hp2 >= hq + 1
    if not direct:
        hq, wq = hp2, wp2
    return hq, wq, hp2, wp2, direct


def _basic_ds_kernel_int8(
    x6_ref, m8_ref, w1p_ref, c1_ref, w2p_ref, c2_ref, wdp_ref, cd_ref,
    mask2_ref, a1_ref, a2_ref, ad_ref,
    o_ref, pl_ref, xw_ref, z1r_ref, il_ref, dma_sems,
    *, bt, hq, wq, hp2, wp2, c, cin, slot2, emit_i8, onedot,
):
    """See the section comment.  m8_ref (2, rows_q, 2*cin) int8 0/1 masks
    the chain-ring garbage out of x before any 3x3 tap reads it (per
    (ph, row, pw-half) — the pw halves differ at the W edges); mask2_ref
    (rows2, 1) f32 is the interior mask of the OUTPUT geometry for conv2's
    interleave.  Scales are host-folded: a1 := sw1*s_x/s_z1 (joint
    per-output-channel over all nine taps — the tap dots accumulate in
    int32 before one dequant), c1 := b1/s_z1, a2 := sw2p*s_z1/s_y per
    (kh, j), c2 := b2/s_y, ad := swd*s_x/s_y, cd := bd/s_y.
    """
    rows_q = bt * hq * wq
    rows2 = bt * hp2 * wp2
    i = pl.program_id(0)

    def pair_dma(step, buf, p):
        return pltpu.make_async_copy(
            x6_ref.at[pl.ds(step * bt, bt), :, p],
            pl_ref.at[buf, p],
            dma_sems.at[buf, p],
        )

    @pl.when(i == 0)
    def _():
        for p in range(2):
            pair_dma(0, 0, p).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        for p in range(2):
            pair_dma(i + 1, (i + 1) % 2, p).start()

    cur = i % 2
    for p in range(2):
        pair_dma(i, cur, p).wait()

    # --- tap scratch: [masked pair | masked pair shifted up one flat row].
    # The shift crosses (bt, hq) boundaries only into rows whose outputs
    # land on the chain ring (garbage-allowed) — same argument as the ds
    # kernel's conv2.
    for ph in range(2):
        # where-select, not an int8 multiply — the codebase's proven Mosaic
        # int8 masking idiom (see _basic_chained_kernel_int8).
        xm = jnp.where(
            m8_ref[ph] != 0,
            pl_ref[cur, ph].reshape(rows_q, 2 * cin),
            jnp.int8(0),
        )
        xw_ref[ph, :, 0 : 2 * cin] = xm
        xw_ref[ph, 0 : rows_q - 1, 2 * cin : 4 * cin] = (
            jax.lax.slice_in_dim(xm, 1, rows_q, axis=0)
        )

    # --- conv1 (3x3 stride 2): three tap dots, int32 accumulation, ONE
    # dequant (joint per-channel scales).  Tap u reads ph = u%2 at row
    # offset (u//2)*wq — the ds kernel's conv2 mapping.
    M = rows_q - wq - 1
    n_u = hq * wq - wq - 1
    acc = None
    for u in range(3):
        off = (u // 2) * wq
        contrib = jax.lax.dot_general(
            xw_ref[u % 2, off : off + M, :], w1p_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = contrib if acc is None else acc + contrib
    z1 = jnp.maximum(
        acc.astype(jnp.float32) * a1_ref[:].astype(jnp.float32)
        + c1_ref[:].astype(jnp.float32),
        0.0,
    )
    z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

    # --- scatter z1 into the OUTPUT-geometry chain scratch (compact row u
    # -> chain row u + wp2 + 1 per image; ring rows inside the span get
    # garbage and are masked out by mask2 on the way into the interleave).
    for k in range(bt):
        z1r_ref[
            k * hp2 * wp2 + wp2 + 1 : k * hp2 * wp2 + wp2 + 1 + n_u, :
        ] = jax.lax.slice(z1, (k * hq * wq, 0), (k * hq * wq + n_u, c))

    # --- conv2 (3x3 s1) on the output geometry: masked interleave + one
    # kh-batched dot (the basic s1 kernel's structure).
    z1m = jnp.where(mask2_ref[:] > 0.0, z1r_ref[:], jnp.int8(0))
    _interleave_kw(il_ref, z1m, rows=rows2, wp=wp2, slot=slot2, width=c)
    P = jax.lax.dot_general(
        il_ref[:], w2p_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y_all = (
        jax.lax.slice(P, (0, 0), (rows2, c)).astype(jnp.float32)
        * a2_ref[0:1, :].astype(jnp.float32)
        + jax.lax.slice(P, (wp2, c), (wp2 + rows2, 2 * c)).astype(jnp.float32)
        * a2_ref[1:2, :].astype(jnp.float32)
        + jax.lax.slice(P, (2 * wp2, 2 * c), (2 * wp2 + rows2, 3 * c)).astype(
            jnp.float32
        )
        * a2_ref[2:3, :].astype(jnp.float32)
        + c2_ref[:].astype(jnp.float32)
    )

    # --- projection shortcut (1x1 stride 2) + ReLU + store, per image.
    # Plane (1,1) = x[2r, 2c] is the pw=1 half of the ph=1 pair; wdp's zero
    # top half kills the pw=0 lanes so the operand needs no lane slicing.
    pl11 = pl_ref[cur, 1].reshape(rows_q, 2 * cin)
    if onedot:
        # Whole-block shortcut dot + one epilogue (same fp32 op order as
        # the per-image loop below — bit-identical); only the stores stay
        # per image.  Mirrors the bottleneck ds kernel's onedot form.
        sc_all = jax.lax.dot_general(
            jax.lax.slice_in_dim(pl11, 0, M, axis=0), wdp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for k in range(bt):
            base = k * hq * wq
            obase = k * hp2 * wp2 + wp2 + 1
            y = (
                jax.lax.slice_in_dim(y_all, obase, obase + n_u, axis=0)
                + jax.lax.slice_in_dim(
                    sc_all, base, base + n_u, axis=0
                ).astype(jnp.float32)
                * ad_ref[:].astype(jnp.float32)
                + cd_ref[:].astype(jnp.float32)
            )
            y = jnp.maximum(y, 0.0)
            if emit_i8:
                o_ref[obase : obase + n_u, :] = jnp.clip(
                    jnp.round(y), -127.0, 127.0
                ).astype(jnp.int8)
            else:
                o_ref[obase : obase + n_u, :] = y.astype(o_ref.dtype)
        return
    for k in range(bt):
        base = k * hq * wq
        obase = k * hp2 * wp2 + wp2 + 1
        chunk = n_u
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, n_u, chunk):
            n = min(chunk, n_u - lo)
            sc = jax.lax.dot_general(
                jax.lax.slice_in_dim(pl11, base + lo, base + lo + n, axis=0),
                wdp_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (
                jax.lax.slice_in_dim(y_all, obase + lo, obase + lo + n, axis=0)
                + sc.astype(jnp.float32) * ad_ref[:].astype(jnp.float32)
                + cd_ref[:].astype(jnp.float32)
            )
            y = jnp.maximum(y, 0.0)
            if emit_i8:
                o_ref[obase + lo : obase + lo + n, :] = jnp.clip(
                    jnp.round(y), -127.0, 127.0
                ).astype(jnp.int8)
            else:
                o_ref[obase + lo : obase + lo + n, :] = y.astype(o_ref.dtype)


def _pick_bt_basic_ds(
    b: int, hq: int, wq: int, hp2: int, wp2: int, cin: int, c: int
) -> int:
    """Largest divisor of B whose basic-ds working set fits the VMEM budget
    (measured table TBD on chip; the walk mirrors the other pickers)."""
    budget = 40 * 2**20
    slot2 = _round_up(c, 128)
    weights = 3 * 4 * cin * c + 3 * slot2 * 3 * c + 2 * cin * c

    def work(bt: int) -> int:
        rows_q = bt * hq * wq
        rows2 = bt * hp2 * wp2
        return (
            2 * 2 * rows_q * 2 * cin      # pair planes (dbl-buffered)
            + 2 * rows_q * 4 * cin        # tap scratch
            + 2 * rows_q * 2 * cin        # m8 masks
            + rows_q * c * 4              # conv1 int32 acc
            + rows2 * c                   # z1 chain scratch
            + (rows2 + 2 * wp2) * 3 * slot2          # interleave
            + (rows2 + 2 * wp2) * 3 * c * 4          # conv2 P (int32)
            + rows2 * c * 4               # y_all fp32
            + 2 * rows2 * c               # out block (dbl-buffered)
            + weights
        )

    best = 0
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_sp", "emit_i8", "bt", "onedot", "interpret"),
)
def basic_ds_block_s2_int8(
    xr: jax.Array,
    w1pq: jax.Array, sw1: jax.Array, b1: jax.Array,
    w2pq: jax.Array, sw2p: jax.Array, b2: jax.Array,
    wdq: jax.Array, swd: jax.Array, bd: jax.Array,
    scales: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    onedot: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Whole stride-2 BasicBlock (ResNet-18/34 stage transition), one
    kernel, chain to chain.

    xr: (B*Hp*Wp, cin) int8 chain rows of the (h, w_sp) input stage at
    scale scales[0].  Weights per quantize_basic_ds_block: w1pq
    (3, 4*cin, c) the pair-slot packed 3x3/2 with joint per-channel scales
    sw1 (c,); w2pq (3*cin_w?, 3c) the kh-batched 3x3 (quantize_basic_block
    conv2 format, cin_w == c); wdq (cin, c) the 1x1/2 projection.  Output:
    (B*Hp2*Wp2, c) chain rows of the (h/2, w_sp/2) stage, int8 at
    scales[2] when emit_i8 else bf16.  scales = [s_x, s_z1, s_y].
    Reference capability: ResnetBlock stride-2 at expansion 1
    (main.cu:18-46) — torchvision BasicBlock downsample semantics.
    """
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin = xr.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows, (xr.shape, (hp, wp))
    c = sw1.shape[-1]
    oh, ow = (h + 1) // 2, (w_sp + 1) // 2
    hq, wq, hp2, wp2, direct = basic_ds_geometry(h, w_sp)
    if direct:
        x6 = xr.reshape(b, hq, 2, wq, 2 * cin)
    else:
        # Generic geometry: rebuild an equal-geometry padded buffer
        # (hq, wq) == (hp2, wp2), same as downsample_block_s2_int8.
        x = xr.reshape(b, hp, wp, cin)[:, 1 : 1 + h, 1 : 1 + w_sp, :]
        x_pad = jnp.pad(
            x, ((0, 0), (1, 2 * hq - 1 - h), (1, 2 * wq - 1 - w_sp), (0, 0))
        )
        x6 = x_pad.reshape(b, hq, 2, wq, 2 * cin)
    bt = bt or _pick_bt_basic_ds(b, hq, wq, hp2, wp2, cin, c)
    assert bt > 0, "basic-ds block does not fit VMEM at bt=1"
    rows_q = bt * hq * wq
    rows2 = bt * hp2 * wp2
    slot2 = _round_up(c, 128)

    # Pair masks (ph, row, pw-half): plane position (i, j) of plane
    # (ph, pw) is a real x pixel iff 0 <= 2i+ph-1 < h and 0 <= 2j+pw-1 < w.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hq * wq, 1), 0)
    ii, jj = row_ids // wq, row_ids % wq
    m8 = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.tile(
                        (
                            (2 * ii + ph - 1 >= 0) & (2 * ii + ph - 1 < h)
                            & (2 * jj + pw - 1 >= 0)
                            & (2 * jj + pw - 1 < w_sp)
                        ).astype(jnp.int8),
                        (1, cin),
                    )
                    for pw in range(2)
                ],
                axis=1,
            )
            for ph in range(2)
        ]
    )
    m8 = jnp.tile(m8, (1, bt, 1))

    # Output-geometry interior mask for conv2's interleave.
    row2_ids = jax.lax.broadcasted_iota(jnp.int32, (hp2 * wp2, 1), 0)
    r2, cc2 = row2_ids // wp2, row2_ids % wp2
    mask2 = (
        (r2 >= 1) & (r2 <= oh) & (cc2 >= 1) & (cc2 <= ow)
    ).astype(jnp.float32)
    mask2_t = jnp.tile(mask2, (bt, 1))

    def pad_slots(wq_p):
        if slot2 == c:
            return wq_p
        return jnp.pad(
            wq_p.reshape(3, c, 3 * c), ((0, 0), (0, slot2 - c), (0, 0))
        ).reshape(3 * slot2, 3 * c)

    # Host-side scale folding (kernel docstring).  bf16 exit: s_y = 1.
    s_x, s_z1 = scales[0], scales[1]
    s_y = scales[2] if emit_i8 else jnp.float32(1.0)
    a1 = (sw1.astype(jnp.float32) * (s_x / s_z1))[None, :]
    c1 = (b1.astype(jnp.float32) * (1.0 / s_z1))[None, :]
    a2 = (sw2p.astype(jnp.float32) * (s_z1 / s_y)).reshape(3, c)
    c2 = (b2.astype(jnp.float32) * (1.0 / s_y))[None, :]
    ad = (swd.astype(jnp.float32) * (s_x / s_y))[None, :]
    cd = (bd.astype(jnp.float32) * (1.0 / s_y))[None, :]
    # Pair-wide shortcut weights: zero pw=0 half (plane (1,1) selection).
    wdp = jnp.concatenate([jnp.zeros_like(wdq), wdq], axis=0)

    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(
            _basic_ds_kernel_int8,
            bt=bt, hq=hq, wq=wq, hp2=hp2, wp2=wp2, c=c, cin=cin,
            slot2=slot2, emit_i8=emit_i8, onedot=onedot,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x6: kernel DMAs pairs
            pl.BlockSpec((2, rows_q, 2 * cin), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, 4 * cin, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3 * slot2, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((2 * cin, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((rows2, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows2, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hp2 * wp2, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bt, hq, wq, 2 * cin), jnp.int8),
            pltpu.VMEM((2, rows_q, 4 * cin), jnp.int8),  # tap scratch
            pltpu.VMEM((rows2, c), jnp.int8),            # z1 chain scratch
            pltpu.VMEM((rows2 + 2 * wp2, 3 * slot2), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * wq * (9 * cin * c + 9 * c * c + cin * c),
            bytes_accessed=b * hq * wq * 4 * cin + b * hp2 * wp2 * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x6, m8, w1pq, c1, pad_slots(w2pq), c2, wdp, cd, mask2_t,
        a1, a2, ad,
    )


def quantize_basic_ds_block(blk: dict) -> dict:
    """Quantize one BN-folded stride-2 BasicBlock for the basic-ds
    megakernel: conv1 (3x3/2) pair-slot packed (3, 4*cin, c) with JOINT
    per-output-channel scales (the tap dots accumulate in int32 before one
    dequant); conv2 (3x3 s1) in the kh-batched quantize_basic_block
    format; the 1x1/2 projection per-output-channel.  The folded fp
    entries are kept alongside so the bf16 XLA transition branch (the
    BASIC_DS_INT8=False path) still works from the same tree."""
    from resnetc_tpu.ops.pallas.quant import quantize_per_channel

    w1 = blk["conv1"]["weight"]  # (3, 3, cin, c)
    _, _, cin, c = w1.shape
    w1q, sw1 = quantize_per_channel(w1.reshape(9 * cin, c))
    w1q = w1q.reshape(3, 3, cin, c)
    w1p = jnp.concatenate(
        [
            jnp.concatenate([w1q[u, 0], w1q[u, 1]], axis=0)[None]
            for u in range(3)
        ]
    )  # (3, 2*cin, c): [pw0 <- v=0 | pw1 <- v=1]
    shift_slot = jnp.concatenate(
        [w1q[:, 2], jnp.zeros((3, cin, c), w1q.dtype)], axis=1
    )  # (3, 2*cin, c): [pw0 <- v=2 | pw1 <- 0]
    w1pq = jnp.concatenate([w1p, shift_slot], axis=1)  # (3, 4*cin, c)

    w2 = blk["conv2"]["weight"]
    w2pk = jnp.transpose(w2, (1, 2, 0, 3)).reshape(3 * c, 3 * c)
    w2pq, sw2p = quantize_per_channel(w2pk)

    wd = blk["downsample"]["weight"]
    if wd.ndim == 4:
        wd = wd[0, 0]
    wdq, swd = quantize_per_channel(wd)

    out = {
        "w1pq": w1pq, "sw1": sw1, "b1": blk["conv1"]["bias"],
        "w2pq": w2pq, "sw2p": sw2p, "b2": blk["conv2"]["bias"],
        "wdq": wdq, "swd": swd, "bd": blk["downsample"]["bias"],
    }
    out.update({k: blk[k] for k in ("conv1", "conv2", "downsample")})
    return out


# ---------------------------------------------------------------------------
# Stage-run megakernel (int8): a RUN of same-shape identity bottleneck
# blocks in ONE kernel.  The per-block chain kernels are auto-DMA-bandwidth
# bound (~340 GB/s effective through the blocked pipeline), so every block
# boundary costs a full activation round trip; keeping the run's
# activations in two VMEM ping-pong buffers removes (N-1) round trips —
# at L1 (56², 486 MB per boundary) that is the stage's dominant cost.
# ---------------------------------------------------------------------------


def _run_chained_kernel_int8(
    x_ref, w1s_ref, c1s_ref, w2ps_ref, c2s_ref, w3s_ref, c3s_ref, mask_ref,
    a1s_ref, a2s_ref, a3s_ref, s_ref,
    o_ref, z1_ref, act_ref,
    *, n_blocks, bt, hp, wp, c, c4, slot, emit_i8,
    w10_ref=None, wd_ref=None, ad_ref=None, cd_ref=None,
):
    """N bottleneck blocks over one VMEM-resident activation.

    Stacked per-block params: w1s (N*c4, c), w2ps (N*3*slot, 3c),
    w3s (N*c, c4) int8; a1s/c1s (N, c), a2s (N*3, c), c2s (N, c),
    a3s/c3s (N, c4) f32 — host-folded per block exactly like
    _chained_kernel_int8 (block i's s_y is block i+1's s_x; the last
    follows emit_i8).  s_ref (SMEM, (N,)): per-block identity-residual
    scales.  act_ref (2, rows, c4) int8 ping-pong: block n reads
    n == 0 ? x_ref : act[(n-1) % 2] and writes its int8 output to
    act[n % 2]; the last block writes o_ref instead.

    With w10/wd/ad/cd, block 0 is the stride-1 PROJECTION block (ResNet-50
    layer1 block 0): x_ref is (rows, cin) with cin possibly != c4, block
    0's conv1 weight is w10_ref (cin, c) (w1s_ref then stacks blocks
    1..N-1 only), and its residual is the 1x1 projection wd (cin, c4)
    instead of x — the WHOLE stage becomes one kernel and the stage's
    (rows, c4) activation never crosses HBM (at ResNet-50 L1 b256 that is
    a 208MB round trip removed; the kernel's HBM bill drops to the
    (rows, cin=64) pool output in + (rows, c4) out).
    """
    rows = bt * hp * wp
    has_proj = w10_ref is not None

    for n in range(n_blocks):
        last = n == n_blocks - 1
        x_full = x_ref[:] if n == 0 else act_ref[(n - 1) % 2]

        if has_proj and n == 0:
            w1_n = w10_ref[:]
        elif has_proj:
            w1_n = w1s_ref[(n - 1) * c4 : n * c4, :]
        else:
            w1_n = w1s_ref[n * c4 : (n + 1) * c4, :]
        z1 = jax.lax.dot_general(
            x_full, w1_n,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        z1 = jnp.maximum(
            z1.astype(jnp.float32) * a1s_ref[n : n + 1, :].astype(jnp.float32)
            + c1s_ref[n : n + 1, :].astype(jnp.float32),
            0.0,
        )
        z1 = z1 * mask_ref[:]
        z1 = jnp.clip(jnp.round(z1), -127.0, 127.0).astype(jnp.int8)

        _interleave_kw(z1_ref, z1, rows=rows, wp=wp, slot=slot, width=c)

        P = jax.lax.dot_general(
            z1_ref[:], w2ps_ref[n * 3 * slot : (n + 1) * 3 * slot, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc2 = (
            jax.lax.slice(P, (0, 0), (rows, c)).astype(jnp.float32)
            * a2s_ref[3 * n : 3 * n + 1, :].astype(jnp.float32)
            + jax.lax.slice(P, (wp, c), (wp + rows, 2 * c)).astype(jnp.float32)
            * a2s_ref[3 * n + 1 : 3 * n + 2, :].astype(jnp.float32)
            + jax.lax.slice(P, (2 * wp, 2 * c), (2 * wp + rows, 3 * c)).astype(
                jnp.float32
            )
            * a2s_ref[3 * n + 2 : 3 * n + 3, :].astype(jnp.float32)
        )
        z2 = jnp.maximum(acc2 + c2s_ref[n : n + 1, :].astype(jnp.float32), 0.0)
        z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)

        s_res = s_ref[n]
        chunk = rows
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, rows, chunk):
            y = jax.lax.dot_general(
                jax.lax.slice_in_dim(z2, lo, lo + chunk, axis=0),
                w3s_ref[n * c : (n + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * a3s_ref[n : n + 1, :].astype(jnp.float32)
            y = y + c3s_ref[n : n + 1, :].astype(jnp.float32)
            if has_proj and n == 0:
                # Projection shortcut: one more int8 dot in the epilogue,
                # x still read once (same as _chained_kernel_int8's wd).
                sc = jax.lax.dot_general(
                    x_ref[lo : lo + chunk, :], wd_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = y + (
                    sc.astype(jnp.float32) * ad_ref[:].astype(jnp.float32)
                    + cd_ref[:].astype(jnp.float32)
                )
            else:
                if n == 0:
                    res = x_ref[lo : lo + chunk, :]
                else:
                    res = act_ref[(n - 1) % 2, lo : lo + chunk, :]
                y = y + res.astype(jnp.float32) * s_res
            y = jnp.maximum(y, 0.0)
            if last and not emit_i8:
                o_ref[lo : lo + chunk, :] = y.astype(o_ref.dtype)
            else:
                yq = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
                if last:
                    o_ref[lo : lo + chunk, :] = yq
                else:
                    act_ref[n % 2, lo : lo + chunk, :] = yq


def _pick_bt_run_int8(
    b: int, hp: int, wp: int, c: int, c4: int, n_blocks: int,
    cin: int | None = None,
) -> int:
    """Measured-table bt when it applies, else largest divisor of B whose
    stage-run working set fits VMEM (0 if even bt=1 does not fit — the
    caller falls back to per-block kernels).  ``cin`` is the x width when
    block 0 is the projection block (whole-stage form); defaults to c4."""
    # The run kernel raises Mosaic's scoped-VMEM cap to 100MB (v5e VMEM is
    # 128MB); budget leaves headroom for the auto-pipeline's double-buffered
    # grid in/out blocks (counted 2x below) and Mosaic temporaries.
    budget = 56 * 2**20
    cin = c4 if cin is None else cin
    slot = _round_up(c, 128)
    weights = n_blocks * (c4 * c + 3 * slot * 3 * c + c * c4)

    def work(bt: int) -> int:
        rows = bt * hp * wp
        return (
            2 * rows * cin * 1                  # x block (double-buffered)
            + 2 * rows * c4 * 1                 # act ping-pong
            + (rows + 2 * wp) * 3 * slot * 1    # z1 interleave
            + (rows + 2 * wp) * 3 * c * 4       # P (int32)
            + rows * c * 4                      # acc2 fp32
            + 2 * rows * c4 * 1                 # out block (double-buffered)
            + weights
        )

    # Measured best bt (v5e, salted harness, 2026-08-17): the L1 c=64
    # 2-block identity run at bt=2 is 1.14x per-block; larger bt loses
    # (bt=4: 0.76x — VMEM thrash).  The hit is keyed to the SWEPT config
    # (c, n_blocks, identity-cin) so the whole-stage proj form (n=3,
    # cin=64) walks/sweeps its own bt instead of inheriting this one.
    # Other stages don't run-fuse in production (RUN_FUSE_STAGES).
    hit = {(64, 2, 256): 2}.get((c, n_blocks, cin))
    if hit is not None and b % hit == 0 and work(hit) <= budget:
        return hit
    best = 0
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


@functools.partial(
    jax.jit, static_argnames=("h", "w_sp", "emit_i8", "bt", "interpret", "pipe_dma")
)
def bottleneck_run_chained_int8(
    xq: jax.Array,
    w1q_s: jax.Array, sw1_s: jax.Array, b1_s: jax.Array,
    w2pq_s: jax.Array, sw2p_s: jax.Array, b2_s: jax.Array,
    w3q_s: jax.Array, sw3_s: jax.Array, b3_s: jax.Array,
    scales_s: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    interpret: bool = False,
    pipe_dma: bool = False,
    w1q0: jax.Array | None = None,
    wdq: jax.Array | None = None,
    swd: jax.Array | None = None,
    bd: jax.Array | None = None,
) -> jax.Array:
    """A run of N bottleneck blocks as ONE kernel (see
    _run_chained_kernel_int8).  Stacked inputs: w1q_s (N, c4, c), sw1_s
    (N, c), b1_s (N, c), w2pq_s (N, 3c, 3c), sw2p_s (N, 3c), b2_s (N, c),
    w3q_s (N, c, c4), sw3_s/b3_s (N, c4); scales_s (N, 4) rows
    [s_x, s_z1, s_z2, s_y] with row i's s_y equal to row i+1's s_x.

    With w1q0/wdq/swd/bd, block 0 is the stride-1 PROJECTION block and xq
    is (rows, cin) with cin = w1q0.shape[0] (== wdq.shape[0], possibly !=
    c4): the WHOLE ResNet-50 layer1 stage runs as one kernel.  The stacked
    arrays then describe blocks 0..N-1 uniformly EXCEPT w1q_s, which
    stacks blocks 1..N-1 only (block 0's conv1 is w1q0, (cin, c));
    scales_s row 0's s_x is the x scale.  w1q_s must still carry N-1 >= 1
    rows (a lone projection block is bottleneck_block_chained_int8's job).
    """
    has_proj = w1q0 is not None
    if has_proj:
        n_m1, c4, c = w1q_s.shape
        n_blocks = n_m1 + 1
        cin = w1q0.shape[0]
        assert wdq is not None and wdq.shape == (cin, c4), (wdq,)
        assert sw1_s.shape[0] == n_blocks, (sw1_s.shape, n_blocks)
    else:
        n_blocks, c4, c = w1q_s.shape
        cin = c4
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin_in = xq.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows and cin_in == cin, (xq.shape,)
    bt = bt or _pick_bt_run_int8(b, hp, wp, c, c4, n_blocks, cin=cin)
    assert bt > 0, "stage run does not fit VMEM; use per-block kernels"

    rows = bt * hp * wp
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    slot = _round_up(c, 128)
    w2pq_pad = w2pq_s.reshape(n_blocks, 3, c, 3 * c)
    if slot != c:
        w2pq_pad = jnp.pad(w2pq_pad, ((0, 0), (0, 0), (0, slot - c), (0, 0)))
    w2ps = w2pq_pad.reshape(n_blocks * 3 * slot, 3 * c)

    # Per-block host-side folding (same contract as the single-block
    # kernel; the last block's s_y is 1 when it exits to bf16).
    s_x = scales_s[:, 0]
    s_z1 = scales_s[:, 1]
    s_z2 = scales_s[:, 2]
    s_y = scales_s[:, 3]
    if not emit_i8:
        s_y = s_y.at[n_blocks - 1].set(1.0)
    a1 = sw1_s.astype(jnp.float32) * (s_x / s_z1)[:, None]
    c1 = b1_s.astype(jnp.float32) * (1.0 / s_z1)[:, None]
    a2 = (
        sw2p_s.astype(jnp.float32) * (s_z1 / s_z2)[:, None]
    ).reshape(n_blocks * 3, c)
    c2 = b2_s.astype(jnp.float32) * (1.0 / s_z2)[:, None]
    a3 = sw3_s.astype(jnp.float32) * (s_z2 / s_y)[:, None]
    c3 = b3_s.astype(jnp.float32) * (1.0 / s_y)[:, None]
    s_res = (s_x / s_y).astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    r, cc = row_ids // wp, row_ids % wp
    mask = ((r >= 1) & (r <= h) & (cc >= 1) & (cc <= w_sp)).astype(jnp.float32)
    mask_t = jnp.tile(mask, (bt, 1))

    n_w1 = n_blocks - 1 if has_proj else n_blocks
    in_specs = [
        pl.BlockSpec((rows, cin), lambda i: (i, 0)),
        pl.BlockSpec((n_w1 * c4, c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * 3 * slot, 3 * c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * c, c4), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c4), lambda i: (0, 0)),
        pl.BlockSpec((rows, 1), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks * 3, c), lambda i: (0, 0)),
        pl.BlockSpec((n_blocks, c4), lambda i: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [
        xq,
        w1q_s.reshape(n_w1 * c4, c), c1, w2ps, c2,
        w3q_s.reshape(n_blocks * c, c4), c3, mask_t,
        a1, a2, a3,
        s_res,
    ]
    if has_proj:
        # Block-0 projection folding, same contract as the single kernel:
        # swd := swd * s_x/s_y0, bd := bd / s_y0 (block 0 is never the run
        # tail — n_blocks >= 2 — so its s_y is always scales_s[0, 3]).
        ad = (swd.astype(jnp.float32) * (s_x[0] / scales_s[0, 3]))[None, :]
        cd = (bd.astype(jnp.float32) * (1.0 / scales_s[0, 3]))[None, :]
        in_specs += [
            pl.BlockSpec((cin, c), lambda i: (0, 0)),
            pl.BlockSpec((cin, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
        ]
        operands += [w1q0, wdq, ad, cd]

    def kernel(*refs):
        extra = {}
        if has_proj:
            extra = dict(
                w10_ref=refs[12], wd_ref=refs[13],
                ad_ref=refs[14], cd_ref=refs[15],
            )
        kw = dict(
            n_blocks=n_blocks, bt=bt, hp=hp, wp=wp, c=c, c4=c4, slot=slot,
            emit_i8=emit_i8, **extra,
        )
        tail = refs[12 + 4 * has_proj :]
        if pipe_dma:
            o_hbm, z1, act, xbuf, obuf, isems, osems = tail
            _pipe_dma_wrap(
                lambda x_vmem, o_vmem: _run_chained_kernel_int8(
                    x_vmem, *refs[1:12], o_vmem, z1, act, **kw
                ),
                refs[0], o_hbm, xbuf, obuf, isems, osems, rows,
            )
        else:
            _run_chained_kernel_int8(*refs[:12], *tail, **kw)

    scratch = [
        pltpu.VMEM((rows + 2 * wp, 3 * slot), jnp.int8),
        pltpu.VMEM((2, rows, c4), jnp.int8),
    ]
    if pipe_dma:
        in_specs[0] = pl.BlockSpec(memory_space=pl.ANY)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [
            pltpu.VMEM((2, rows, cin), jnp.int8),   # in-stream ping-pong
            pltpu.VMEM((2, rows, c4), out_dtype),   # out-stream ping-pong
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        out_specs = pl.BlockSpec((rows, c4), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b * hp * wp, c4), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if pipe_dma else ("parallel",),
            # Same rationale as bottleneck_block_chained_int8: the 16MB
            # default cap forced bt=1 (the round-2 "run fusion is slower"
            # measurement was taken there); v5e has 128MB.
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            # Proj form: block 0's conv1 contracts over cin (not c4) and
            # adds the wd projection dot.
            flops=2 * b * hp * wp * (
                n_blocks * (9 * c * c + c * c4)
                + (n_blocks - 1) * c4 * c
                + (cin * c + cin * c4 if has_proj else c4 * c)
            ),
            bytes_accessed=b * hp * wp * (cin + c4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Stride-2 downsample-block megakernel (int8): block 0 of layers 2-4 in one
# kernel — conv1x1 at full res, 3x3/2 via phase planes, conv1x1 + projection
# shortcut at half res — x read once (as four int8 phase planes), y written
# once, directly in the CHAIN layout so the following stride-1 chain needs no
# entry pad.  The phase planes come straight from the producing stage's chain
# buffer via MANUAL strided DMA: the chain layout already carries the conv
# ring, and its (hp, wp) are even with wp == 2*wp_next at every ResNet
# stage, so a free 6-D reshape exposes each plane as a rectangular subarray
# that the DMA engine gathers at full rate.  (The XLA-side alternatives are
# all measured disasters: four strided int8 slices ran at ~13% of HBM
# roofline, the fine-grained W-interleave transpose at ~70 GB/s cost ~3 ms
# alone at the L2 shape, and in-kernel lane repacking of int8 was 3x slower
# than the plain kernel.)  Reference capability: main.cu:48-82 (ResnetBlock
# with downsample); the decomposition is the phase-plane trick of
# conv_s2_fused applied inside a block-level kernel.
# ---------------------------------------------------------------------------


def _ds_block_s2_kernel(
    x6_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    wd_ref, bd_ref, mask_ref,
    sw1_ref, sw2_ref, sw3_ref, swd_ref,
    o_ref, pl_ref, z1w_ref, dma_sems,
    *more,
    bt, hq, wq, hp2, wp2, c, cin, c4, emit_i8, pair_dma, onedot,
    pipe_out=False,
):
    """x6_ref: the INPUT stage's chain buffer left in HBM/ANY, viewed
    (B, hq, 2, wq, 2, cin) — a free reshape of the flat chain rows; plane
    (ph, pw)[i, j] = chain[2i+ph, 2j+pw] = x_pad[2i+ph, 2j+pw] (ring
    garbage is masked after conv1).  The kernel prologue DMAs the four
    planes for its bt images into pl_ref (4, bt, hq, wq, cin) — each a
    rectangular strided subarray the DMA engine handles natively.

    (hq, wq) = (hp/2, wp/2) of the input chain; (hp2, wp2) is the OUTPUT
    stage's chain geometry.  wq == wp2 is required: it makes the in-image
    mapping compact-conv-row u -> output chain row u + wp2 + 1 a flat
    shift, so only per-image base offsets differ.

    Requant scales are HOST-FOLDED (see _chained_kernel_int8): sw1 :=
    sw1*s_x/s_z1, b1 := b1/s_z1, sw2 := sw2*s_z1/s_z2 (joint per output
    channel — the tap dots accumulate in int32 before one dequant),
    b2 := b2/s_z2, sw3 := sw3*s_z2/s_y, b3 := b3/s_y, swd := swd*s_x/s_y,
    bd := bd/s_y.  mask_ref (4, rows, 1) is pre-tiled over bt.

    conv2 runs as THREE aligned K=3c dots, not nine: tap (u, v) needs plane
    (u%2, v%2) at row offset (u//2)*wq + (v//2), and the +1 offsets of the
    v=2 taps are unaligned sublane reads (a per-tap row rotate — the exact
    trap the bf16 megakernel history records).  Instead conv1 writes each
    ph-row of planes into an interleaved scratch z1w (2, rows, 3c) with
    lanes [0:c] = pw0, [c:2c] = pw1, [2c:3c] = pw0 shifted up one row; the
    three v-taps of each u then sit in one (M, 3c) aligned slice at offset
    (u//2)*wq (wq is 8-aligned), against w2 packed (3, 3c, c).
    """
    rows = bt * hq * wq
    i = pl.program_id(0)

    # --- plane gather: four strided DMAs per grid step, DOUBLE-BUFFERED
    # across grid steps (the manual ANY-space gather is outside Mosaic's
    # auto-pipeline, so without prefetch every step eats the full gather
    # latency serially — the measured p0 "DMA floor").  Step i's planes
    # land in buffer i%2 while step i+1's gather streams into (i+1)%2
    # behind the compute.
    # The source view is (B, hq, 2, wq, 2*cin): ph is an untiled major dim
    # (sliceable), and the W-pair lives in the LANE dim where a cin-sized
    # slice at a cin multiple is tile-aligned — slicing a separate size-2
    # pw dim in the tiled minor zone is rejected by Mosaic ("slice along
    # dimension 4 must be aligned to tiling").
    # pair_dma=True gathers only the two ph halves (2 DMAs; the pw pair
    # stays interleaved in lanes): the innermost contiguous run grows from
    # cin bytes (256 B at L2ds — the fine-grained class) to wq*2*cin bytes
    # (15-32 KB), and the pw split moves to 128-aligned in-kernel lane
    # slices (cin is a 128-multiple at every ds stage).  A/B flag; see
    # tools/probe_ds_dma.py for the isolated gather measurement.
    n_dma = 2 if pair_dma else 4

    def plane_dma(step, buf, p):
        if pair_dma:
            src = x6_ref.at[pl.ds(step * bt, bt), :, p]
        else:
            ph, pw = p // 2, p % 2
            src = x6_ref.at[
                pl.ds(step * bt, bt), :, ph, :, pl.ds(pw * cin, cin)
            ]
        return pltpu.make_async_copy(
            src, pl_ref.at[buf, p], dma_sems.at[buf, p]
        )

    @pl.when(i == 0)
    def _():
        for p in range(n_dma):
            plane_dma(0, 0, p).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        for p in range(n_dma):
            plane_dma(i + 1, (i + 1) % 2, p).start()

    cur = i % 2
    for p in range(n_dma):
        plane_dma(i, cur, p).wait()

    # --- pipe-out (see _pipe_dma_wrap): stores land in an obuf ping-pong
    # and stream out via manual DMA instead of the auto out window (the
    # input side of this kernel is already manual).  Garbage rows (the
    # chain pad the per-image stores never touch) are zero-filled ONCE per
    # buffer — stores only ever touch interior rows, so they stay zero
    # across reuses, matching the auto path's zero-initialized out buffer.
    if pipe_out:
        obuf, osems = more
        rows_out = bt * hp2 * wp2

        def out_dma(step, buf):
            return pltpu.make_async_copy(
                obuf.at[buf],
                o_ref.at[pl.ds(step * rows_out, rows_out), :],
                osems.at[buf],
            )

        @pl.when(i >= 2)
        def _():
            out_dma(i - 2, cur).wait()

        # Static buffer indices (buffer k is first used at step k): a
        # traced-index store into the major dim is an unproven Mosaic
        # pattern; pl.when with literal 0/1 is the proven one.
        @pl.when(i == 0)
        def _():
            obuf[0, :, :] = jnp.zeros((rows_out, c4), obuf.dtype)

        @pl.when(i == 1)
        def _():
            obuf[1, :, :] = jnp.zeros((rows_out, c4), obuf.dtype)

        o_dst = obuf.at[cur]

        def finish_out():
            out_dma(i, cur).start()
            n = pl.num_programs(0)

            @pl.when((i == n - 1) & (n >= 2))
            def _():
                out_dma(i - 1, (i - 1) % 2).wait()

            @pl.when(i == n - 1)
            def _():
                out_dma(i, cur).wait()
    else:
        o_dst = o_ref

        def finish_out():
            pass

    # --- conv1 (1x1, cin -> c): fused dequant+bias+relu+mask epilogue,
    # per-plane slices into the interleaved scratch.  Flat over all bt
    # images: conv1 is per-pixel, image boundaries don't matter here.
    if pair_dma:
        # Two half-size dots, one per pw (operands are 128-aligned lane
        # slices of the pair buffer — no garbage FLOPs, no relayout); rows
        # [0:rows] of each are ph=0, [rows:2rows] ph=1.  mask_ref is
        # host-ordered (pw, ph-concat) to match.
        pairv = pl_ref[cur].reshape(2 * rows, 2 * cin)
        for pw in range(2):
            zq = jax.lax.dot_general(
                jax.lax.slice(
                    pairv, (0, pw * cin), (2 * rows, (pw + 1) * cin)
                ),
                w1_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            zq = jnp.maximum(
                zq.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
                + b1_ref[:].astype(jnp.float32),
                0.0,
            )
            zq = zq * mask_ref[pw].reshape(2 * rows, 1)
            zq = jnp.clip(jnp.round(zq), -127.0, 127.0).astype(jnp.int8)
            zr = zq.reshape(2, rows, c)
            z1w_ref[:, :, pw * c : (pw + 1) * c] = zr
            if pw == 0:
                for ph in range(2):
                    z1w_ref[ph, 0 : rows - 1, 2 * c : 3 * c] = zr[ph, 1:rows]
    else:
        # ONE dot over all four phase planes stacked in M (the per-plane
        # dot+epilogue pairs serialized MXU-idle epilogues between
        # quarter-size dots).
        zall = jax.lax.dot_general(
            pl_ref[cur].reshape(4 * rows, cin), w1_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        zall = jnp.maximum(
            zall.astype(jnp.float32) * sw1_ref[:].astype(jnp.float32)
            + b1_ref[:].astype(jnp.float32),
            0.0,
        )
        zall = zall * mask_ref[:].reshape(4 * rows, 1)
        zall = jnp.clip(jnp.round(zall), -127.0, 127.0).astype(jnp.int8)
        for ph in range(2):
            for pw in range(2):
                p = ph * 2 + pw
                zq = jax.lax.slice(zall, (p * rows, 0), ((p + 1) * rows, c))
                if pw == 0:
                    z1w_ref[ph, :, 0:c] = zq
                    # +1-row shifted copy for the v=2 taps; the last row is
                    # never read (max tap row = rows - 2).  (A VMEM->VMEM DMA
                    # can't do this: misaligned-row slices of tiled VMEM refs
                    # are rejected by Mosaic.)
                    z1w_ref[ph, 0 : rows - 1, 2 * c : 3 * c] = (
                        jax.lax.slice_in_dim(zq, 1, rows, axis=0)
                    )
                else:
                    z1w_ref[ph, :, c : 2 * c] = zq

    # --- conv2 (3x3 stride 2): three aligned (M, 3c) @ (3c, c) int8 dots
    # over the FULL multi-image block (M = rows - wq - 1) — per-image dots
    # were too small for the MXU (measured 2.5x slower at L3b0, bt=4).
    # Rows whose taps would cross an image boundary are garbage, but every
    # row the store keeps (u < n_u within its image) taps only its own
    # image: max index = base + n_u - 1 + wq + 1 < base + hq*wq.
    M = rows - wq - 1
    n_u = hq * wq - wq - 1  # per-image compact rows worth storing
    acc = None
    for u in range(3):
        off = (u // 2) * wq
        contrib = jax.lax.dot_general(
            z1w_ref[u % 2, off : off + M, :], w2_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = contrib if acc is None else acc + contrib
    z2 = acc.astype(jnp.float32) * sw2_ref[:].astype(jnp.float32)
    z2 = jnp.maximum(z2 + b2_ref[:].astype(jnp.float32), 0.0)
    z2 = jnp.clip(jnp.round(z2), -127.0, 127.0).astype(jnp.int8)

    # --- conv3 (1x1, c -> 4c) + projection shortcut + ReLU, per image (the
    # store offset shifts by hp2*wp2 - hq*wq between images; plane geometry
    # (hq, wq) and output chain geometry (hp2, wp2) differ in H).  wq == wp2
    # keeps the in-image mapping one flat shift: compact conv row
    # u = r*wq + cc -> output chain row u + wp2 + 1.  The stride-2 1x1
    # shortcut reads x[2r, 2c] = plane (1,1) at the SAME compact row index.
    if pair_dma:
        # Shortcut plane (ph=1, pw=1): the pw=1 lanes of the ph=1 pair —
        # a 128-aligned lane slice (cin % 128 == 0 at every ds stage).
        pl3 = jax.lax.slice(
            pl_ref[cur, 1].reshape(rows, 2 * cin), (0, cin), (rows, 2 * cin)
        )
    else:
        pl3 = pl_ref[cur, 3].reshape(rows, cin)
    if onedot:
        # Whole-block form: TWO full-size dots (main + shortcut) over all
        # bt images at once, ONE vector epilogue, then per-image stores.
        # The per-image loop below runs 2*bt*ceil(n_u/chunk) small dots
        # with an MXU-idle epilogue between each pair; here the MXU sees
        # maximal M and the epilogue runs once.  The wq+1 boundary-garbage
        # rows per image (~4% of M) are computed and never stored.  Same
        # fp32 op order as the loop — bit-identical output.
        y = jax.lax.dot_general(
            z2, w3_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
        y = y + b3_ref[:].astype(jnp.float32)
        sc = jax.lax.dot_general(
            jax.lax.slice_in_dim(pl3, 0, M, axis=0), wd_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y + (
            sc.astype(jnp.float32) * swd_ref[:].astype(jnp.float32)
            + bd_ref[:].astype(jnp.float32)
        )
        y = jnp.maximum(y, 0.0)
        if emit_i8:
            y = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
        else:
            y = y.astype(o_ref.dtype)
        for k in range(bt):
            base = k * hq * wq
            obase = k * hp2 * wp2 + wp2 + 1
            o_dst[obase : obase + n_u, :] = jax.lax.slice_in_dim(
                y, base, base + n_u, axis=0
            )
        finish_out()
        return
    for k in range(bt):
        base = k * hq * wq
        obase = k * hp2 * wp2 + wp2 + 1
        chunk = n_u
        while chunk > 1024 and chunk % 2 == 0:
            chunk //= 2
        for lo in range(0, n_u, chunk):
            n = min(chunk, n_u - lo)
            y = jax.lax.dot_general(
                jax.lax.slice_in_dim(z2, base + lo, base + lo + n, axis=0),
                w3_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * sw3_ref[:].astype(jnp.float32)
            y = y + b3_ref[:].astype(jnp.float32)
            sc = jax.lax.dot_general(
                jax.lax.slice_in_dim(pl3, base + lo, base + lo + n, axis=0),
                wd_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y + (
                sc.astype(jnp.float32) * swd_ref[:].astype(jnp.float32)
                + bd_ref[:].astype(jnp.float32)
            )
            y = jnp.maximum(y, 0.0)
            if emit_i8:
                o_dst[obase + lo : obase + lo + n, :] = jnp.clip(
                    jnp.round(y), -127.0, 127.0
                ).astype(jnp.int8)
            else:
                o_dst[obase + lo : obase + lo + n, :] = y.astype(o_ref.dtype)
    finish_out()


def _pick_bt_ds_s2(b: int, hq: int, wq: int, cin: int, c: int, c4: int) -> int:
    """Measured-table bt when it applies, else largest divisor of B whose
    s2 ds-block working set fits the VMEM budget."""
    # v5e sweep (salted harness, 2026-08-17): the budget walk's picks were
    # already optimal at L2ds (bt=2) and L3ds (bt=4); L4ds c=512 improved
    # at bt=8 (0.960 vs 1.023 ms, -6%).
    budget = 9 * 2**20
    weights = cin * c + 9 * c * c + c * c4 + cin * c4

    def work(bt: int) -> int:
        rows = bt * hq * wq
        return (
            8 * rows * cin * 1     # phase planes (int8, double-buffered)
            + 6 * rows * c * 1     # interleaved z1 scratch (2, rows, 3c)
            + rows * c * 4         # conv2 int32 accumulator
            + rows * c4 * 1        # output block
            + weights
        )

    # Take the measured hit when it fits the COMPILE-SAFETY bound, not the
    # 9MB perf-walk heuristic: the hit was measured at the production 224px
    # L4ds geometry (hq=wq=8, work(8) ≈ 13.9MB — above the walk budget,
    # compiles and wins -6%).  The guard only needs to reject genuinely
    # cap-threatening working sets (image-size ≥ ~448 grows work(8) past
    # 90MB against the kernel's 100MB vmem_limit_bytes).
    hit_cap = 40 * 2**20
    hit = {512: 8}.get(c)
    if hit is not None and b % hit == 0 and work(hit) <= hit_cap:
        return hit
    best = 1
    for bt in range(1, b + 1):
        if b % bt:
            continue
        if work(bt) > budget:
            break
        best = bt
    return best


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w_sp", "emit_i8", "bt", "pair_dma", "onedot", "pipe_out",
        "interpret",
    ),
)
def downsample_block_s2_int8(
    xr: jax.Array,
    w1q: jax.Array, sw1: jax.Array, b1: jax.Array,
    w2q: jax.Array, sw2: jax.Array, b2: jax.Array,
    w3q: jax.Array, sw3: jax.Array, b3: jax.Array,
    wdq: jax.Array, swd: jax.Array, bd: jax.Array,
    scales: jax.Array,
    *,
    h: int, w_sp: int,
    emit_i8: bool = True,
    bt: int | None = None,
    pair_dma: bool = False,
    onedot: bool = False,
    pipe_out: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Whole stride-2 bottleneck downsample block, one kernel, chain to chain.

    xr: (B*Hp*Wp, cin) int8 CHAIN rows of the (h, w_sp) input stage at scale
    scales[0] — exactly what the previous stage's chain kernels emit (ring
    garbage included; it is masked after conv1).  Weights per
    quantize_ds_block.  Output: (B*Hp2*Wp2, 4c) rows in the chain layout of
    the (h/2, w_sp/2) stage — feed it directly to
    bottleneck_block_chained_int8.  scales = [s_x, s_z1, s_z2, s_y].
    """
    hp, wp = chain_meta(0, h, w_sp)
    total_rows, cin = xr.shape
    b = total_rows // (hp * wp)
    assert b * hp * wp == total_rows, (xr.shape, (hp, wp))
    c = w1q.shape[-1]
    c4 = w3q.shape[-1]
    oh, ow = (h + 1) // 2, (w_sp + 1) // 2
    hp2, wp2 = chain_meta(0, oh, ow)
    hq, wq = hp // 2, wp // 2
    # Fast path (holds at every 224-input ResNet stage; see kernel
    # docstring): a FREE 6-D reshape of the chain buffer — chain row
    # (2i+ph, 2j+pw) IS x_pad[2i+ph, 2j+pw] (the chain layout carries the
    # conv ring) — exposes each plane as a rectangular subarray the kernel
    # gathers itself with strided DMA.  No XLA-side data movement at all.
    direct = (
        hp % 2 == 0 and wp % 2 == 0 and wq == wp2 and hp2 >= hq + 1
    )
    if direct:
        x6 = xr.reshape(b, hq, 2, wq, 2 * cin)
    else:
        # Generic geometry (other input sizes): rebuild an equal-geometry
        # padded buffer (hq, wq) == (hp2, wp2); the kernel then DMA-gathers
        # from it the same way.
        hq, wq = hp2, wp2
        x = xr.reshape(b, hp, wp, cin)[:, 1 : 1 + h, 1 : 1 + w_sp, :]
        x_pad = jnp.pad(
            x, ((0, 0), (1, 2 * hq - 1 - h), (1, 2 * wq - 1 - w_sp), (0, 0))
        )
        x6 = x_pad.reshape(b, hq, 2, wq, 2 * cin)
    bt = bt or _pick_bt_ds_s2(b, hq, wq, cin, c, c4)

    # Per-plane interior masks: plane position (i, j) is a real x pixel iff
    # 0 <= 2i+ph-1 < h and 0 <= 2j+pw-1 < w.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hq * wq, 1), 0)
    i, j = row_ids // wq, row_ids % wq
    masks = jnp.stack(
        [
            (
                (2 * i + ph - 1 >= 0) & (2 * i + ph - 1 < h)
                & (2 * j + pw - 1 >= 0) & (2 * j + pw - 1 < w_sp)
            ).astype(jnp.float32)
            for ph in range(2)
            for pw in range(2)
        ]
    )
    masks_t = jnp.tile(masks, (1, bt, 1))
    # pair_dma needs 128-aligned lane slices of the 2*cin pair; every real
    # ResNet ds stage qualifies (cin = 256/512/1024).
    pair_dma = pair_dma and cin % 128 == 0
    if pair_dma:
        # Kernel mask order for the per-pw conv1 dots: [pw][ph-concat rows].
        masks_t = jnp.stack(
            [
                jnp.concatenate([masks_t[pw], masks_t[2 + pw]], axis=0)
                for pw in range(2)
            ]
        )

    # Host-side scale folding (see kernel docstring).  The bf16 exit
    # (emit_i8=False) emits UNSCALED activations: s_y = 1.
    s_x, s_z1, s_z2 = scales[0], scales[1], scales[2]
    s_y = scales[3] if emit_i8 else jnp.float32(1.0)
    a1 = (sw1.astype(jnp.float32) * (s_x / s_z1))[None, :]
    c1 = (b1.astype(jnp.float32) * (1.0 / s_z1))[None, :]
    a2 = (sw2.astype(jnp.float32) * (s_z1 / s_z2))[None, :]
    c2 = (b2.astype(jnp.float32) * (1.0 / s_z2))[None, :]
    a3 = (sw3.astype(jnp.float32) * (s_z2 / s_y))[None, :]
    c3 = (b3.astype(jnp.float32) * (1.0 / s_y))[None, :]
    ad = (swd.astype(jnp.float32) * (s_x / s_y))[None, :]
    cd = (bd.astype(jnp.float32) * (1.0 / s_y))[None, :]

    rows = bt * hq * wq
    rows_out = bt * hp2 * wp2
    out_dtype = jnp.int8 if emit_i8 else jnp.bfloat16
    scratch = [
        # DMA'd phase planes (or ph pairs), double-buffered across steps
        pltpu.VMEM(
            (2, 2, bt, hq, wq, 2 * cin)
            if pair_dma
            else (2, 4, bt, hq, wq, cin),
            jnp.int8,
        ),
        pltpu.VMEM((2, rows, 3 * c), jnp.int8),  # interleaved z1 planes
        pltpu.SemaphoreType.DMA((2, 2) if pair_dma else (2, 4)),
    ]
    if pipe_out:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [
            pltpu.VMEM((2, rows_out, c4), out_dtype),  # out-stream ping-pong
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        out_specs = pl.BlockSpec((rows_out, c4), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(
            _ds_block_s2_kernel,
            bt=bt, hq=hq, wq=wq, hp2=hp2, wp2=wp2, c=c, cin=cin, c4=c4,
            emit_i8=emit_i8, pair_dma=pair_dma, onedot=onedot,
            pipe_out=pipe_out,
        ),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x6: kernel DMAs planes
            pl.BlockSpec((cin, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((cin, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec(
                (2, 2 * rows, 1) if pair_dma else (4, rows, 1),
                lambda i: (0, 0, 0),
            ),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
            pl.BlockSpec((1, c4), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b * hp2 * wp2, c4), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Same rationale as the chain kernels: the 16MB default scoped-
            # VMEM cap forces small bt; v5e has 128MB.
            vmem_limit_bytes=VMEM_CAP_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * wq * (cin * c + 9 * c * c + c * c4 + cin * c4),
            bytes_accessed=b * hq * wq * (4 * cin + c4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x6, w1q, c1, w2q.reshape(3, 3 * c, c), c2, w3q, c3,
        wdq, cd, masks_t,
        a1, a2, a3, ad,
    )


def quantize_ds_block(blk: dict) -> dict:
    """Quantize one BN-folded downsample bottleneck block for the s2 (or s1)
    downsample megakernels: conv1/conv3/downsample per-output-channel; conv2
    with JOINT per-output-channel scales across all nine taps (the s2 kernel
    accumulates the taps in int32 before one dequant)."""
    from resnetc_tpu.ops.pallas.quant import quantize_per_channel

    w1 = blk["conv1"]["weight"]
    w2 = blk["conv2"]["weight"]
    w3 = blk["conv3"]["weight"]
    wd = blk["downsample"]["weight"]
    if w1.ndim == 4:
        w1 = w1[0, 0]
    if w3.ndim == 4:
        w3 = w3[0, 0]
    if wd.ndim == 4:
        wd = wd[0, 0]
    c = w1.shape[-1]
    w2q_flat, sw2 = quantize_per_channel(w2.reshape(9 * c, c))
    w1q, sw1 = quantize_per_channel(w1)
    w3q, sw3 = quantize_per_channel(w3)
    wdq, swd = quantize_per_channel(wd)
    return {
        "w1q": w1q, "sw1": sw1, "b1": blk["conv1"]["bias"],
        "w2q": w2q_flat.reshape(3, 3, c, c), "sw2": sw2, "b2": blk["conv2"]["bias"],
        "w3q": w3q, "sw3": sw3, "b3": blk["conv3"]["bias"],
        "wdq": wdq, "swd": swd, "bd": blk["downsample"]["bias"],
    }


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
