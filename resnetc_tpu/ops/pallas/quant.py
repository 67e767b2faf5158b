"""Int8 quantized inference kernels (BASELINE.json config #5 variant).

Scheme: symmetric int8 —

- **weights**: per-output-channel scales, quantized offline from the
  BN-folded fp32 weights (fold first, then quantize: the BN multiplier is
  absorbed into the per-channel scale for free);
- **activations**: per-tensor dynamic scale (abs-max over the batch),
  computed on device;
- **matmul**: int8 x int8 -> int32 on the MXU (v5e runs int8 at 2x bf16
  throughput), with the dequant (scale_x * scale_w[n]), bias, residual and
  ReLU fused into the epilogue — the quantized twin of gemm.matmul.

1x1 convs (the FLOPs majority) and the fc layer route through this; 3x3
convs stay bf16 in the mixed int8 serving path (quantizing them too is a
later optimisation; see serve.py backend="int8").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quantize_per_channel(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp weights (K, N) -> (int8 (K, N), per-column scale (N,) f32)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_per_tensor(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp activations -> (int8, scalar scale f32). Dynamic (per call)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_gemm_kernel(x_ref, w_ref, sx_ref, sw_ref, b_ref, r_ref, o_ref, acc_ref, *, n_k, relu):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        scale = sx_ref[0, 0] * sw_ref[:].astype(jnp.float32)  # (1, tn)
        out = acc_ref[:].astype(jnp.float32) * scale
        if b_ref is not None:
            out = out + b_ref[:].astype(jnp.float32)
        if r_ref is not None:
            out = out + r_ref[:].astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "out_dtype", "interpret")
)
def int8_matmul(
    x_q: jax.Array,
    w_q: jax.Array,
    scale_x: jax.Array,
    scale_w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    relu: bool = False,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """``relu(dequant(x_q @ w_q) + bias + residual)`` with int32 MXU accumulate.

    x_q: (M, K) int8; w_q: (K, N) int8; scale_x: scalar; scale_w: (N,).
    """
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2

    tm = min(512, _round_up(m, 128))
    tn = min(256, _round_up(n, 128))
    tk = min(1024, _round_up(k, 128))
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)
    if (mp, kp) != (m, k):
        x_q = jnp.pad(x_q, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_q = jnp.pad(w_q, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        scale_w = jnp.pad(scale_w, (0, np_ - n))
        if bias is not None:
            bias = jnp.pad(bias, (0, np_ - n))
    if residual is not None and (mp, np_) != (m, n):
        residual = jnp.pad(residual, ((0, mp - m), (0, np_ - n)))

    grid = (mp // tm, np_ // tn, kp // tk)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tn), lambda i, j, kk: (0, j)),
    ]
    operands = [x_q, w_q, scale_x.reshape(1, 1), scale_w[None, :]]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j, kk: (0, j)))
        operands.append(bias[None, :])
    if residual is not None:
        in_specs.append(pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)))
        operands.append(residual)

    def kernel(*refs):
        idx = 4
        b_ref = refs[idx] if bias is not None else None
        idx += bias is not None
        r_ref = refs[idx] if residual is not None else None
        idx += residual is not None
        o_ref, acc_ref = refs[idx], refs[idx + 1]
        _int8_gemm_kernel(
            refs[0], refs[1], refs[2], refs[3], b_ref, r_ref, o_ref, acc_ref,
            n_k=grid[2], relu=relu,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def conv1x1_int8(
    x: jax.Array,
    w_q: jax.Array,
    scale_w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    stride: int = 1,
    relu: bool = False,
    out_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Dynamic-quantized 1x1 conv: quantize activations per tensor, int8 GEMM.

    x: (B, H, W, Cin) float; w_q: (Cin, Cout) int8 (pre-quantized, BN-folded);
    scale_w: (Cout,).
    """
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    b, h, w_sp, cin = x.shape
    cout = w_q.shape[-1]
    x_q, scale_x = quantize_per_tensor(x)
    res2d = residual.reshape(b * h * w_sp, cout) if residual is not None else None
    out = int8_matmul(
        x_q.reshape(b * h * w_sp, cin), w_q, scale_x, scale_w, bias, res2d,
        relu=relu, out_dtype=out_dtype, interpret=interpret,
    )
    return out.reshape(b, h, w_sp, cout)


# ---------------------------------------------------------------------------
# Model-level quantization: int8 serving variant (BASELINE.json config #5).
# ---------------------------------------------------------------------------


def quantize_folded(folded) -> dict:
    """Quantize a BN-folded tree for int8 serving.

    Every 1x1 conv (and the fc) gets {"w_q" int8 (Cin, Cout), "scale_w"
    (Cout,), "bias"}; other convs (3x3/7x7 — a minority of FLOPs) keep their
    fp weights and run bf16.  Fold-then-quantize: the BN multiplier is
    already inside the weight, so no extra scale bookkeeping.
    """

    def walk(node):
        if isinstance(node, dict) and "weight" in node and "bias" in node:
            w = node["weight"]
            if w.ndim == 4 and w.shape[:2] == (1, 1):
                w_q, scale = quantize_per_channel(w[0, 0])
                return {"w_q": w_q, "scale_w": scale, "bias": node["bias"]}
            if w.ndim == 2:  # fc [out, in] -> quantize (in, out)
                w_q, scale = quantize_per_channel(jnp.transpose(w))
                return {"w_q": w_q, "scale_w": scale, "bias": node["bias"]}
            return dict(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(folded)


def quantize_with_scale(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Static-scale symmetric int8 quantization (no absmax reduction)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)
