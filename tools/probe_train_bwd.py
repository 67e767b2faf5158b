#!/usr/bin/env python
"""Attribute the training backward pass: which gradient ops are slow?

profile_train.py shows bwd ≈ 72% of the step (PERF.md round 3).  This
probe times the XLA lowering of each backward building block in isolation
(salted chained harness) at the L2 bottleneck shape, plus whole-block
fwd-vs-fwd+bwd at every stage shape — enough to decide whether a targeted
custom-VJP Pallas kernel (and for which op) can lift training.

Building blocks at (M, K, N) = (B*H*W, C, C') with NHWC activations:
  fwd 1x1    : x @ W                      (the forward GEMM, reference rate)
  dgrad 1x1  : dy @ W^T                   (same GEMM, transposed weight)
  wgrad 1x1  : x^T @ dy                   (M=C, K=B*H*W — tall-skinny)
  fwd 3x3    : conv_general_dilated
  dgrad 3x3  : transposed conv (input grad)
  wgrad 3x3  : conv with batch as contraction (weight grad)
  bn-bwd     : the batch-stats backward chain on (B,H,W,C)

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_train_bwd.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models import resnet
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.timing import chained_seconds_per_iter


def bench(name, fn, carry, flops=None, iters=16):
    sec = chained_seconds_per_iter(fn, carry, iters=iters)
    rate = f"  {flops / sec / 1e12:6.1f} TF/s" if flops else ""
    print(f"  {name:14s} {sec * 1e3:8.3f} ms{rate}", flush=True)
    return sec


def salted(body, x):
    """Feedback is a FULL |sum| over the output: a GEMM/conv grad whose
    consumer is an (8,8) slice gets narrowed by XLA to 8 output rows (the
    first run of this probe printed 26e6 TF/s for dgrad); the abs-reduction
    keeps every output element live and cannot be reassociated away.

    The perturbation must be a dynamic-update-slice, NOT a scalar add: with
    ``(x + eps) @ w`` XLA distributes and hoists the loop-invariant
    ``x @ w`` out of the timing loop entirely (the 2026-08-19 run printed
    843 and 59e6 TF/s for the two fwd rows this way — same trap class
    health.py hit; the grad rows survived only by luck of the lowering)."""

    def fn(salt):
        upd = (salt * 1e-30).astype(x.dtype)
        if x.ndim == 4:
            upd = upd.reshape(1, 8, 8, 1)
        xx = jax.lax.dynamic_update_slice(x, upd, (0,) * x.ndim)
        out = body(xx)
        return jnp.full((8, 8), jnp.sum(jnp.abs(out.astype(jnp.float32))))

    return fn


def main() -> int:
    rng = np.random.default_rng(0)
    salt0 = jnp.zeros((8, 8), jnp.float32)
    B, H, C, C1 = 256, 28, 512, 128  # the L2 bottleneck block shape

    g = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16)
    x = g(B * H * H, C)
    dy = g(B * H * H, C1)
    w = g(C, C1)
    x4 = g(B, H, H, C1)
    dy4 = g(B, H, H, C1)
    w3 = g(3, 3, C1, C1)

    print(f"== 1x1 grads at (M,K,N)=({B * H * H},{C},{C1})")
    fl = 2 * B * H * H * C * C1
    bench("fwd x@W", salted(lambda xx: xx @ w, x), salt0, fl)
    bench("dgrad dy@W^T", salted(lambda d: d @ w.T, dy), salt0, fl)
    bench(
        "wgrad x^T@dy",
        salted(lambda xx: (xx.T @ dy).reshape(C, C1), x),
        salt0, fl,
    )

    print(f"== 3x3 grads at (B,H,W,C)=({B},{H},{H},{C1})")
    fl3 = 2 * B * H * H * 9 * C1 * C1
    dn = jax.lax.conv_dimension_numbers(
        x4.shape, w3.shape, ("NHWC", "HWIO", "NHWC")
    )

    def conv_fwd(xx):
        return jax.lax.conv_general_dilated(
            xx, w3, (1, 1), "SAME", dimension_numbers=dn
        )

    bench("fwd conv3x3", salted(conv_fwd, x4), salt0, fl3)

    # input grad: VJP w.r.t. x
    _, vjp_x = jax.vjp(conv_fwd, x4)
    bench("dgrad conv3x3", salted(lambda d: vjp_x(d)[0], dy4), salt0, fl3)

    def conv_w(ww):
        return jax.lax.conv_general_dilated(
            x4, ww, (1, 1), "SAME", dimension_numbers=dn
        )

    _, vjp_w = jax.vjp(conv_w, w3)
    bench(
        "wgrad conv3x3",
        salted(lambda d: vjp_w(d)[0].reshape(9 * C1, C1), dy4),
        salt0, fl3,
    )

    print(f"== BN train bwd at (B,H,W,C)=({B},{H},{H},{C1})")
    gamma = jnp.ones((C1,), jnp.float32)
    beta = jnp.zeros((C1,), jnp.float32)
    rmean = jnp.zeros((C1,), jnp.float32)
    rvar = jnp.ones((C1,), jnp.float32)

    def bn_fwd(xx):
        y, _, _ = lax_ops.batch_norm_train(xx, gamma, beta, rmean, rvar)
        return y

    _, vjp_bn = jax.vjp(bn_fwd, x4)
    bench("bn-bwd", salted(lambda d: vjp_bn(d)[0], dy4), salt0)

    # whole-block fwd vs fwd+bwd at each stage shape
    print("== whole bottleneck block fwd vs fwd+bwd (loss_fn-style)")
    from resnetc_tpu import train as train_mod

    for model, label in (("resnet50", "resnet50 b256"),):
        cfg = resnet.get_config(model)
        ts = train_mod.init_train_state(cfg, jax.random.key(0))
        xb = jnp.asarray(
            rng.standard_normal((256, 224, 224, 3), dtype=np.float32)
        )
        yb = jnp.asarray(np.arange(256, dtype=np.int32) % 1000)

        def fwd(salt):
            xx = jax.lax.dynamic_update_slice(
                xb, (salt * 1e-30).astype(xb.dtype).reshape(1, 8, 8, 1), (0, 0, 0, 0)
            )
            loss, _ = train_mod.loss_fn(
                cfg, ts.params, ts.bn_state, xx, yb, policy=BF16
            )
            return jnp.full((8, 8), loss)

        def fwd_bwd(salt):
            xx = jax.lax.dynamic_update_slice(
                xb, (salt * 1e-30).astype(xb.dtype).reshape(1, 8, 8, 1), (0, 0, 0, 0)
            )
            (loss, _), grads = jax.value_and_grad(
                lambda p: train_mod.loss_fn(
                    cfg, p, ts.bn_state, xx, yb, policy=BF16
                ),
                has_aux=True,
            )(ts.params)
            g0 = sum(
                jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
            )
            return jnp.full((8, 8), loss + g0 * 1e-30)

        s1 = bench(f"{label} fwd", fwd, salt0, iters=8)
        s2 = bench(f"{label} f+b", fwd_bwd, salt0, iters=8)
        print(f"  -> bwd alone ≈ {(s2 - s1) * 1e3:.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
