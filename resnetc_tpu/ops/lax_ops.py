"""XLA oracle ops — the numerical ground truth for every kernel in the framework.

Each function here is the TPU-native equivalent of one CUDA kernel in the
reference (cuda/ops.cu), expressed as pure ``jax.lax`` ops so XLA can fuse and
schedule them (the reference instead serialises ~470 kernel launches with a
``cudaDeviceSynchronize`` after each, cuda/nn.cu:14 et al.).  The Pallas
kernels in ``resnetc_tpu.ops.pallas`` are golden-tested against these.

Semantics pinned to the reference:

- conv2d: square kernel, symmetric stride/padding, zero padding, **no bias**
  (ResNet convs are bias-free) — reference cuda/ops.cu:14-48.
- max_pool2d: padding contributes -inf (out-of-bounds skipped) —
  reference cuda/ops.cu:50-78.
- avg_pool2d: divisor is always ``kernel_size**2`` (count_include_pad=True)
  — reference cuda/ops.cu:80-108, esp. :107.
- linear: ``out = x @ W.T + b``, weight layout ``[out_features, in_features]``
  — reference cuda/ops.cu:110-128.
- batch_norm inference: ``(x - mean)/sqrt(var + eps) * gamma + beta`` with
  running stats, eps=1e-5 — reference cuda/ops.cu:139-151.
- relu / add: elementwise — reference cuda/ops.cu:130-137, :153-160.

All activation tensors are NHWC; conv weights are HWIO (see resnetc_tpu.tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

EPS = 1e-5  # BatchNorm epsilon, fixed to the reference's value (cuda/ops.cu:150).

# PyTorch BatchNorm2d default momentum, used for running-stat updates in
# training mode (the reference is inference-only; this is new surface).
BN_MOMENTUM = 0.1

#: MXU precision for sub-fp32 (bf16) operands.  fp32 operands ALWAYS get
#: HIGHEST — the lax default silently downcasts and the fp32 policy is the
#: torch-parity mode.  For bf16 operands HIGHEST is NOT free: the on-chip
#: probe (tools/battery/stem_pad.py, 2026-08-19) measured a 4096^3 bf16 dot
#: at 227 TF/s DEFAULT vs 188 TF/s HIGHEST (-17%) — DEFAULT is the single
#: MXU pass (bf16 multiply, fp32 accumulate), which is already the bf16
#: policy's semantics.  Module-level so the battery can A/B it.
BF16_PRECISION = lax.Precision.DEFAULT


def _precision(*operands) -> lax.Precision:
    """HIGHEST for fp32 math, BF16_PRECISION for bf16-class operands."""
    return (
        lax.Precision.HIGHEST
        if any(o.dtype == jnp.float32 for o in operands)
        else BF16_PRECISION
    )


def _conv_prim(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
    accum_dtype: jnp.dtype | None,
    groups: int = 1,
) -> jax.Array:
    # Precision follows the operand dtype (see _precision): fp32 inputs
    # must actually compute in fp32, not the silently downcast lax
    # default; bf16 inputs take the single-MXU-pass DEFAULT (HIGHEST
    # measured -17% on bf16 dots with identical bf16-policy semantics).
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
        precision=_precision(x, w),
    )


@functools.lru_cache(maxsize=None)
def _mixed_dtype_conv(stride: int, padding: int, accum_dtype, groups: int = 1):
    """Differentiable conv whose forward accumulates in ``accum_dtype`` while
    operands/outputs stay in the compute dtype (e.g. bf16).

    lax's conv transpose rule rejects the mixed-dtype cotangent that
    ``preferred_element_type`` produces, so the backward runs same-dtype
    convs instead (the MXU accumulates fp32 internally either way — this is
    the standard bf16-training recipe)."""

    def primal(x, w):
        return _conv_prim(
            x, w, stride, padding, accum_dtype, groups
        ).astype(x.dtype)

    @jax.custom_vjp
    def conv(x, w):
        return primal(x, w)

    def fwd(x, w):
        return primal(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(
            lambda a, b: _conv_prim(a, b, stride, padding, None, groups), x, w
        )
        return vjp(g.astype(x.dtype))

    conv.defvjp(fwd, bwd)
    return conv


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding: int = 0,
    accum_dtype: jnp.dtype = jnp.float32,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, zero-padded, bias-free.

    Accumulates in ``accum_dtype`` (fp32 by default) regardless of the input
    compute dtype, then casts back — the bf16-with-fp32-accumulate contract
    the MXU expects.  ``groups`` is XLA's feature_group_count (ResNeXt's
    grouped 3x3; kernel shape (kh, kw, cin/groups, cout)).
    """
    if x.dtype == jnp.dtype(accum_dtype):
        return _conv_prim(x, w, stride, padding, accum_dtype, groups)
    return _mixed_dtype_conv(stride, padding, jnp.dtype(accum_dtype), groups)(x, w)


def max_pool2d(x: jax.Array, *, kernel_size: int, stride: int, padding: int) -> jax.Array:
    """Max pool, NHWC. Padded elements are -inf, matching the reference's
    skip-out-of-bounds-start-from--inf loop (cuda/ops.cu:64)."""
    # Init must be a static scalar: a traced init defeats the reduce-window-max
    # specialisation and with it reverse-mode autodiff under jit.  For int
    # inputs it must also be a dtype-matched numpy scalar — a Python int
    # promotes to int32 and reduce_window rejects the dtype mismatch.
    neg_inf = (
        -jnp.inf
        if jnp.issubdtype(x.dtype, jnp.floating)
        else np.asarray(jnp.iinfo(x.dtype).min, x.dtype)[()]
    )
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: jax.Array, *, kernel_size: int, stride: int, padding: int = 0) -> jax.Array:
    """Average pool, NHWC, divisor = kernel_size**2 (count_include_pad=True).

    The reference divides the window sum by ``kernel_size²`` unconditionally
    (cuda/ops.cu:107); it only ever calls this as the final global 7x7 pool
    where no padding exists, so it matches AdaptiveAvgPool2d((1,1)) there.
    We pin the same divisor semantics for all shapes.
    """
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        jnp.float32(0),
        lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (summed / (kernel_size * kernel_size)).astype(x.dtype)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """Global spatial mean, NHWC -> NC.

    The reference implements this as an explicit 7x7/1 avgPool2d plus a
    flattening ``view`` (cuda/inference/main.cu:213-219); on TPU a plain mean
    reduction fuses better and works for any input resolution.
    """
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def linear(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Fully-connected layer: ``x [B, in] @ W.T [in, out] + b``.

    Weight layout is PyTorch's ``[out_features, in_features]``
    (reference cuda/ops.cu:119-123); bias optional via None, mirroring the
    kernel's null-pointer check (cuda/ops.cu:124-126).
    """
    out = lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=accum_dtype,
        precision=_precision(x, w),
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def relu(x: jax.Array) -> jax.Array:
    """Elementwise max(x, 0) — reference cuda/ops.cu:130-137."""
    return jnp.maximum(x, jnp.zeros((), x.dtype))


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Residual add — reference cuda/ops.cu:153-160."""
    return a + b


def batch_norm_inference(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    *,
    eps: float = EPS,
) -> jax.Array:
    """Inference-mode batch norm with running statistics.

    ``(x - mean) / sqrt(var + eps) * scale + bias`` per channel —
    reference cuda/ops.cu:149-150.  Per-channel affine is precomputed in fp32
    so the per-element work is one fused multiply-add.
    """
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    a = (scale.astype(jnp.float32) * inv).astype(x.dtype)
    c = (bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale.astype(jnp.float32) * inv).astype(x.dtype)
    return x * a + c


def batch_norm_train(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    eps: float = EPS,
    momentum: float = BN_MOMENTUM,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode batch norm: normalise with batch statistics, return
    updated running statistics.

    New surface relative to the reference (which is inference-only,
    SURVEY.md §2): semantics match PyTorch ``BatchNorm2d.train()`` —
    normalisation uses the *biased* batch variance, the running-var update
    uses the *unbiased* one, and updates are
    ``running <- (1 - momentum) * running + momentum * batch``.

    If ``axis_name`` is given, batch statistics are averaged across that
    mapped axis (sync-BN over the data-parallel mesh axis via ``psum``-backed
    ``pmean``).
    """
    xf = x.astype(jnp.float32)
    reduce_axes = (0, 1, 2)  # N, H, W — per-channel stats
    n = x.shape[0] * x.shape[1] * x.shape[2]
    batch_mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if axis_name is not None:
        # Combine raw moments across devices, not per-device variances:
        # pmean(E[x²]_i − m_i²) would drop the between-device variance term
        # pmean(m_i²) − m_global², underestimating var whenever per-device
        # means differ.  pmean(E[x²]) − pmean(m)² is the exact global-batch
        # variance (PyTorch SyncBatchNorm semantics).
        batch_mean = lax.pmean(batch_mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
        n = n * lax.psum(1, axis_name)
    batch_var = mean_sq - jnp.square(batch_mean)

    inv = lax.rsqrt(batch_var + eps)
    a = (scale.astype(jnp.float32) * inv).astype(x.dtype)
    c = (bias.astype(jnp.float32) - batch_mean * scale.astype(jnp.float32) * inv).astype(x.dtype)
    out = x * a + c

    # PyTorch tracks the unbiased variance in running_var.
    unbiased_var = batch_var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean.astype(jnp.float32) + momentum * batch_mean
    new_var = (1 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased_var
    return out, new_mean.astype(running_mean.dtype), new_var.astype(running_var.dtype)


def fold_bn_into_conv(
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    *,
    eps: float = EPS,
) -> tuple[jax.Array, jax.Array]:
    """Fold an inference-mode BN into the preceding (bias-free) conv.

    Mathematically exact given the reference's BN formula (cuda/ops.cu:149-150):
    ``BN(conv(x, W)) == conv(x, W * g) + c`` with ``g = scale/sqrt(var+eps)``
    broadcast over the output-channel axis and ``c = bias - mean * g``.
    Used by the serving path; training keeps BN unfused (SURVEY.md §7).

    ``w`` is HWIO; returns (folded_w [HWIO], folded_bias [O]).
    """
    g = scale.astype(jnp.float32) * lax.rsqrt(var.astype(jnp.float32) + eps)
    folded_w = (w.astype(jnp.float32) * g[None, None, None, :]).astype(w.dtype)
    folded_b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * g
    return folded_w, folded_b
