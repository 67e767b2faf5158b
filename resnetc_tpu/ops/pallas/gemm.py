"""Tiled MXU matmul with a fused epilogue (bias + residual + ReLU + cast).

The workhorse kernel: 1x1 convolutions — over half of a bottleneck ResNet's
FLOPs — are exactly this GEMM over (B*H*W, Cin) x (Cin, Cout), and the fc
head is the (B, 2048) x (2048, classes) case (the reference computes that
one scalar per block with a 2048-wide serial loop, cuda/ops.cu:110-128).

Grid is (M/TM, N/TN, K/TK) with the K axis innermost ("arbitrary" semantics:
sequential, accumulator carried in VMEM scratch across K steps).  The
epilogue runs once per (m, n) tile on the final K step, so bias-add,
residual-add, ReLU, and the bf16 cast cost zero extra HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gemm_kernel(x_ref, w_ref, b_ref, r_ref, o_ref, acc_ref, *, n_k, relu):
    """One (m, n, k) grid step: acc += x @ w; epilogue on the last k step."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        out = acc_ref[:]
        if b_ref is not None:
            out = out + b_ref[:].astype(jnp.float32)
        if r_ref is not None:
            out = out + r_ref[:].astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


#: Autotuned tile table, (M, K, N) -> (tm, tn, tk), produced by
#: tools/autotune_gemm.py on the v5e (salted harness; see PERF.md).  Exact
#: shape matches only — the heuristic below covers everything else.
#: Populated from <repo>/GEMM_TILES.json when the autotuner has run on
#: chip (same measured-defaults pattern as TUNED.json; the file is written
#: only by tools/autotune_gemm.py).  RESNETC_NO_TUNED=1 pins the empty
#: code default — the tests' config.
_BEST_TILES: dict[tuple[int, int, int], tuple[int, int, int]] = {}


def _load_tile_table() -> None:
    import json as _json
    import os as _os
    from pathlib import Path as _Path

    if _os.environ.get("RESNETC_NO_TUNED") == "1":
        return
    path = _Path(
        _os.environ.get("RESNETC_GEMM_TILES_JSON")
        or _Path(__file__).resolve().parents[3] / "GEMM_TILES.json"
    )
    try:
        data = _json.loads(path.read_text())
        for row in data.get("tiles", []):
            m, k, n = row["shape"]
            tm, tn, tk = row["tiles"]
            if all(type(v) is int and v > 0 for v in (m, k, n, tm, tn, tk)):
                _BEST_TILES[(m, k, n)] = (tm, tn, tk)
    except Exception:
        pass  # absent/malformed table must never break an import


_load_tile_table()


def _pick_tiles(m: int, n: int, k: int) -> tuple[int, int, int]:
    """Tile sizes: autotuned table hit, else MXU-aligned heuristic."""
    hit = _BEST_TILES.get((m, k, n))
    if hit is not None:
        return hit
    tm = min(512, _round_up(m, 128))
    tn = min(256, _round_up(n, 128))
    tk = min(512, _round_up(k, 128))
    return tm, tn, tk


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_dtype", "tm", "tn", "tk", "interpret"),
)
def matmul(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    *,
    relu: bool = False,
    out_dtype: jnp.dtype | None = None,
    tm: int | None = None,
    tn: int | None = None,
    tk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``relu(x @ w + bias + residual)`` in one MXU pass.

    x: (M, K); w: (K, N); bias: (N,) or None; residual: (M, N) or None.
    Output dtype defaults to x.dtype; accumulation is always fp32.
    Ragged edges are zero-padded to tile multiples and sliced off after —
    zero rows/cols contribute nothing to the accumulator.
    """
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, f"contraction mismatch: {x.shape} @ {w.shape}"
    out_dtype = out_dtype or x.dtype

    _tm, _tn, _tk = _pick_tiles(m, n, k)
    tm, tn, tk = tm or _tm, tn or _tn, tk or _tk

    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    if bias is not None and np_ != n:
        bias = jnp.pad(bias, (0, np_ - n))
    if residual is not None and (mp, np_) != (m, n):
        residual = jnp.pad(residual, ((0, mp - m), (0, np_ - n)))

    grid = (mp // tm, np_ // tn, kp // tk)

    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
    ]
    operands = [x, w]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j, kk: (0, j)))
        operands.append(bias[None, :])
    if residual is not None:
        in_specs.append(pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)))
        operands.append(residual)

    def kernel(*refs):
        idx = 2
        b_ref = refs[idx] if bias is not None else None
        idx += bias is not None
        r_ref = refs[idx] if residual is not None else None
        idx += residual is not None
        o_ref, acc_ref = refs[idx], refs[idx + 1]
        _gemm_kernel(
            refs[0], refs[1], b_ref, r_ref, o_ref, acc_ref,
            n_k=grid[2], relu=relu,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
