"""Per-block chain-kernel bt sweep under CURRENT machine conditions.

The bt tables in block.py were measured in round 3; per-grid-step overhead
and DMA behavior move with machine health, so the optimum can shift.  This
sweeps the identity chain kernel at every ResNet-50 stage geometry over a
range of bt (each halves the grid-step count of the previous), salted
harness, and prints ms + effective TF/s so winners can be pasted into the
measured tables.

Usage: python tools/battery/bt_sweep.py [--shapes 56,28,14,7] [--b 256]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.block import (
    bottleneck_block_chained_int8, chain_meta, quantize_chain_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter

SHAPES = {
    "56": (56, 256, 64),
    "28": (28, 512, 128),
    "14": (14, 1024, 256),
    "7": (7, 2048, 512),
}


def sweep(name, b):
    h, cin, c = SHAPES[name]
    c4 = 4 * c
    rng = np.random.default_rng(0)
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    q = quantize_chain_block({
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
    })
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(rng.integers(-127, 128, (b * hp * wp, cin)), jnp.int8)
    flops = 2 * b * hp * wp * (cin * c + 9 * c * c + c * c4)

    print(f"-- {h}x{h} cin={cin} c={c} (b{b})", flush=True)
    for bt in (1, 2, 4, 8, 16, 32):
        if b % bt:
            continue
        def fn(salt, xq, bt=bt):
            s = scales + jnp.sum(salt) * 1e-30
            out = bottleneck_block_chained_int8(
                xq, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"],
                q["b2"], q["w3q"], q["sw3"], q["b3"], s,
                h=h, w_sp=h, emit_i8=True, bt=bt)
            return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

        try:
            # consts: xr as a jit arg (the closure-ship trap); repeats: the
            # L3/L4 kernels are sub-ms where a single pair is RTT noise —
            # the r4 sweep that moved the tables had NO repeats and NO bt=1.
            sec = chained_seconds_per_iter(
                fn, jnp.zeros((8, 8), jnp.float32), iters=16, repeats=5,
                consts=(xr,))
            print(f"  bt={bt:3d}: {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"  bt={bt:3d}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="56,28,14,7")
    ap.add_argument("--b", type=int, default=256)
    args = ap.parse_args()
    for s in args.shapes.split(","):
        sweep(s.strip(), args.b)
