"""Extended machine-health probe: separates MXU rate, HBM bandwidth, and
the L1b1 chain kernel so a degraded window can be attributed.

Known-good (healthy v5e via this tunnel):
  - L1b1 chain kernel ~1.53 ms        (degraded 2026-08-17..19: ~2.7 ms)
  - bf16 4096^3 dot   ~179 TF/s       (spec peak 197)
  - HBM stream        ~600+ GB/s      (spec 819 GB/s)

The original health.py dot probe perturbed the dot as ``a @ (b + eps)`` with
a scalar eps — XLA distributes that to ``a@b + eps*rowsum(a)`` and hoists
the big dot out of the timing loop, reading ~0 ms.  Here the perturbation is
a dynamic-update-slice into ``a``, which no simplifier can factor out.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.utils.timing import chained_seconds_per_iter

rng = np.random.default_rng(0)


def probe_mxu():
    # Two traps this probe has to dodge (both hit earlier versions):
    #  - scalar perturbation of an operand (``a @ (b+eps)``) distributes and
    #    the big dot hoists out of the loop;
    #  - returning a SLICE of y lets XLA narrow the dot to the 8 consumed
    #    rows/cols.  The carry is therefore a scalar built from a FULL
    #    reduction of y — every output element stays live.
    a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)

    def step(salt):
        a2 = jax.lax.dynamic_update_slice(
            a, jnp.full((8, 8), salt * 1e-30, jnp.bfloat16), (0, 0)
        )
        return jnp.sum((a2 @ b).astype(jnp.float32))

    sec = chained_seconds_per_iter(step, jnp.float32(0), iters=16)
    tf = 2 * 4096**3 / sec / 1e12
    return sec, tf


def probe_hbm():
    # 256 MB fp32 stream: each iteration reads + writes the full array.
    n = 64 * 2**20
    x0 = jnp.asarray(rng.standard_normal(n, dtype=np.float32))

    def step(x):
        return x * jnp.float32(1.0000001)

    sec = chained_seconds_per_iter(step, x0, iters=16)
    gb = 2 * n * 4 / sec / 1e9
    return sec, gb


def probe_l1b1():
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8, chain_meta, quantize_chain_block,
    )

    h, cin, c = 56, 256, 64
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    q = quantize_chain_block({
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
    })
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(rng.integers(-127, 128, (256 * hp * wp, cin)), jnp.int8)

    def fn(salt):
        s = scales + jnp.sum(salt) * 1e-30
        out = bottleneck_block_chained_int8(
            xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"], s, h=h, w_sp=h, emit_i8=True)
        return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

    return chained_seconds_per_iter(fn, jnp.zeros((8, 8), jnp.float32), iters=16)


if __name__ == "__main__":
    sec, tf = probe_mxu()
    print(f"health2 mxu dot4096: {sec*1e3:.3f} ms  {tf:.0f} TF/s "
          f"({'HEALTHY' if tf > 140 else 'DEGRADED'})")
    sec, gb = probe_hbm()
    print(f"health2 hbm stream 256MB: {sec*1e3:.3f} ms  {gb:.0f} GB/s "
          f"({'HEALTHY' if gb > 450 else 'DEGRADED'})")
    sec = probe_l1b1()
    print(f"health2 L1b1: {sec*1e3:.3f} ms "
          f"({'HEALTHY' if sec < 1.9e-3 else 'DEGRADED'})")
