#!/usr/bin/env python
"""Attribute training-step time: forward, forward+backward, full step.

The train path (train.py) is pure XLA — VERDICT r2 item 7 asks whether a
Pallas train-side megakernel is worth building.  This tool answers the
prerequisite question: where does the 2,668 img/s step actually spend its
time?

  fwd      : loss_fn only (train=True BN batch stats, no grad)
  fwd+bwd  : value_and_grad of the same (adds the backward pass)
  full     : production train_step (adds SGD update + metrics)
  eval-fwd : inference forward at the same batch (train=False), for the
             BN-batch-stats surcharge

All phases run through the chained harness (utils/timing.py — the only
trustworthy clock on this host, see PERF.md) with donated/chained state so
XLA cannot elide work across iterations.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/profile_train.py \
           [--model resnet50] [--batch 256] [--iters 8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu import train as train_mod
from resnetc_tpu.models import resnet
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.timing import chained_seconds_per_iter


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    cfg = resnet.get_config(args.model)
    tcfg = train_mod.TrainConfig(lr=0.1, policy_name="bf16", remat=args.remat)
    ts = train_mod.init_train_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.batch, args.image_size, args.image_size, 3), dtype=np.float32)
    )
    y = jnp.asarray(np.arange(args.batch, dtype=np.int32) % 1000)
    lr = jnp.float32(0.1)
    flops_fwd = 2 * 4.09e9 * args.batch  # 2*MACs fwd (utils/flops ~8.18/2)

    def report(name, sec, mult):
        ips = args.batch / sec
        print(
            f"  {name:9s} {sec * 1e3:8.3f} ms  {ips:8.1f} img/s  "
            f"~{mult * flops_fwd / sec / 1e12:6.1f} TF/s-equiv",
            flush=True,
        )

    # --- fwd only (train-mode BN): salt rides the images so each iteration
    # depends on the previous loss.  The batch and params are harness
    # ``consts`` (jit arguments): closed-over arrays ship inside the
    # serialized compile request on this runtime, and b384 images + params
    # exceeded the axon remote_compile body limit (HTTP 413).
    params, bn_state = ts.params, ts.bn_state

    def fwd(salt, xc, pc):
        xx = jax.lax.dynamic_update_slice(
            xc, (salt * 1e-30).astype(xc.dtype).reshape(1, 8, 8, 1), (0, 0, 0, 0)
        )
        loss, _ = train_mod.loss_fn(
            cfg, pc, bn_state, xx, y, policy=BF16, remat=args.remat
        )
        return jnp.full((8, 8), loss)

    sec = chained_seconds_per_iter(
        fwd, jnp.zeros((8, 8), jnp.float32), iters=args.iters,
        consts=(x, params),
    )
    report("fwd", sec, 1.0)

    # --- eval-mode fwd at the same batch (BN running stats, no batch moments)
    variables = resnet.merge_params_state(params, bn_state)

    def eval_fwd(salt, xc, vc):
        xx = jax.lax.dynamic_update_slice(
            xc, (salt * 1e-30).astype(xc.dtype).reshape(1, 8, 8, 1), (0, 0, 0, 0)
        )
        logits, _ = resnet.forward(cfg, vc, xx, train=False, policy=BF16)
        return jnp.full((8, 8), jnp.sum(logits.astype(jnp.float32)))

    sec = chained_seconds_per_iter(
        eval_fwd, jnp.zeros((8, 8), jnp.float32), iters=args.iters,
        consts=(x, variables),
    )
    report("eval-fwd", sec, 1.0)

    # --- fwd + bwd (no optimizer)
    def fwd_bwd(salt, xc, pc):
        xx = jax.lax.dynamic_update_slice(
            xc, (salt * 1e-30).astype(xc.dtype).reshape(1, 8, 8, 1), (0, 0, 0, 0)
        )
        (loss, _), grads = jax.value_and_grad(
            lambda p: train_mod.loss_fn(
                cfg, p, bn_state, xx, y, policy=BF16, remat=args.remat
            ),
            has_aux=True,
        )(pc)
        # fold a hash of the grads into the carry so none can be elided
        g0 = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return jnp.full((8, 8), loss + g0 * 1e-30)

    sec = chained_seconds_per_iter(
        fwd_bwd, jnp.zeros((8, 8), jnp.float32), iters=args.iters,
        consts=(x, params),
    )
    report("fwd+bwd", sec, 3.0)

    # --- full production step, state chained through the iterations
    import time

    def run_steps(state, n):
        for _ in range(n):
            state, m = train_mod.train_step(cfg, tcfg, state, x, y, lr)
        return state, float(m["loss"])

    ts, _ = run_steps(ts, 1)  # compile + warm
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, 1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, args.iters + 1)
    t_many = time.perf_counter() - t0
    sec = (t_many - t_one) / args.iters
    report("full", sec, 3.0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
