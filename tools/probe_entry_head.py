#!/usr/bin/env python
"""Attribute the int8_chain pipeline's NON-megakernel time: entry + head.

The 20 block megakernels are benched in isolation (bench_chain_blocks /
profile_dsblock); their healthy-machine sum is ~13.2 ms while e2e is
~17.3 ms.  This probe measures the remaining pieces with the salted
harness, as CUMULATIVE prefixes (increments attribute each piece; a
direct salted bench of an int8-input stage would need an extra
dependency pass that inflates small numbers — same methodology as
probe_i8chain_phases):

  p0 stem+q   : conv7x7 s2 bf16 (XLA) + fused quantize epilogue
  p1 +pool    : + 3x3 s2 max pool on int8 (XLA reduce_window)
  p2 +pad     : + pad_for_chain (the production entry composition)
  head        : unpad_from_chain + global mean + fc matmul (bf16 rows in,
                salted directly — bf16 carries the salt without a pass)
  e2e         : full fused_forward_int8_chain (reference point)

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/probe_entry_head.py
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
from resnetc_tpu.ops.pallas.block import pad_for_chain, unpad_from_chain
from resnetc_tpu.ops.pallas.fused import (
    calibrate_chain_scales, fused_forward_int8_chain, quantize_chain,
)
from resnetc_tpu.ops.pallas.quant import quantize_with_scale
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.timing import chained_seconds_per_iter


def bench(name, fn, carry, prev=0.0, iters=16):
    sec = chained_seconds_per_iter(fn, carry, iters=iters)
    print(
        f"  {name:10s} {sec * 1e3:7.3f} ms  (+{(sec - prev) * 1e3:6.3f})",
        flush=True,
    )
    return sec


def main() -> int:
    cfg = resnet.get_config("resnet50")
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    policy = BF16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 224, 224, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x[:8], policy=policy)
    qtree = quantize_chain(cfg, folded)
    salt0 = jnp.zeros((8, 8), jnp.float32)

    w = folded["conv1"]["weight"].astype(policy.compute)
    bias = folded["conv1"]["bias"]
    s_in = scales["layer1"]["0"]["in"]

    def stem_q(xx):
        y = lax_ops.conv2d(
            xx.astype(policy.compute), w, stride=2, padding=3
        ) + bias.astype(policy.compute)
        return quantize_with_scale(jax.nn.relu(y), s_in)

    def salted(body):
        # dynamic-update-slice salt + FULL |sum| feedback: a scalar-add salt
        # distributes through the linear stem conv (XLA hoists the invariant
        # conv out of the loop) and a sliced return lets XLA narrow dots to
        # the consumed rows — both traps measured on this machine (see
        # probe_train_bwd.py docstring / health.py).
        def fn(salt):
            upd = (salt * 1e-30).astype(x.dtype).reshape(1, 8, 8, 1)
            xx = jax.lax.dynamic_update_slice(x, upd, (0, 0, 0, 0))
            out = body(xx)
            return jnp.full((8, 8), jnp.sum(jnp.abs(out.astype(jnp.float32))))

        return fn

    p0 = bench("p0 stem+q", salted(stem_q), salt0)
    p1 = bench(
        "p1 +pool",
        salted(
            lambda xx: lax_ops.max_pool2d(
                stem_q(xx), kernel_size=3, stride=2, padding=1
            )
        ),
        salt0,
        p0,
    )
    p2 = bench(
        "p2 +pad",
        salted(
            lambda xx: pad_for_chain(
                lax_ops.max_pool2d(stem_q(xx), kernel_size=3, stride=2, padding=1)
            )
        ),
        salt0,
        p1,
    )

    # head: bf16 rows (the tail block's emit) -> unpad -> mean -> fc
    rows_shape = pad_for_chain(jnp.zeros((2, 7, 7, 2048), jnp.int8)).shape
    rows_tail = jnp.asarray(
        rng.standard_normal((rows_shape[0] * 128, 2048), dtype=np.float32),
        jnp.bfloat16,
    )
    fcw = jnp.transpose(folded["fc"]["weight"]).astype(policy.compute)
    fcb = folded["fc"]["bias"]

    def head(salt):
        rr = jax.lax.dynamic_update_slice(
            rows_tail, (salt * 1e-30).astype(rows_tail.dtype), (0, 0)
        )
        y = unpad_from_chain(rr, 256, 7, 7)
        feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2)).astype(
            policy.compute
        )
        logits = feats @ fcw + fcb.astype(policy.compute)
        return jnp.full((8, 8), jnp.sum(jnp.abs(logits.astype(jnp.float32))))

    bench("head", head, salt0)

    def e2e(salt):
        upd = (salt * 1e-30).astype(x.dtype).reshape(1, 8, 8, 1)
        xx = jax.lax.dynamic_update_slice(x, upd, (0, 0, 0, 0))
        out = fused_forward_int8_chain(cfg, qtree, scales, xx, policy=policy)
        return jnp.full((8, 8), jnp.sum(jnp.abs(out.astype(jnp.float32))))

    sec = bench("e2e", e2e, salt0, iters=8)
    print(f"  e2e -> {256 / sec:.0f} img/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
