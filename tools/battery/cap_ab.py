"""A/B the Mosaic scoped-VMEM cap (16MB default vs the r3 100MB raise) on
the L1b1 chain kernel, paired-interleaved in one window.

Motivation: the round-5 healthy-window regress A/B measured the round-2
build (16MB-era, bt=1-era) at 1.538 ms while EVERY HEAD bt (1/2/4/8) reads
2.47-3.0 ms in the same window — the compute body is trace-identical, so
the remaining build-config suspects are the vmem_limit_bytes raise and
whatever Mosaic does differently under it.

Usage: python tools/battery/cap_ab.py [--bts 1,2,4] [--pairs 3]
Writes CAP_AB.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _common  # noqa: F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from resnetc_tpu.ops.pallas import block  # noqa: E402
from resnetc_tpu.ops.pallas.block import (  # noqa: E402
    bottleneck_block_chained_int8, chain_meta, quantize_chain_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

REPO = Path(__file__).resolve().parents[2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bts", default="1,2,4")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--out", default=str(REPO / "CAP_AB.json"))
    args = ap.parse_args()

    h, cin, c = 56, 256, 64
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
    xr = jnp.asarray(rng.integers(-127, 128, (256 * hp * wp, cin)), jnp.int8)

    def measure(cap, bt):
        old = block.VMEM_CAP_BYTES
        block.VMEM_CAP_BYTES = cap
        # The wrapper is jitted with statics that do NOT include the cap —
        # clear its cache so the flipped global actually retraces (the
        # persistent on-disk cache still serves the device compile).
        bottleneck_block_chained_int8.clear_cache()

        def fn(salt, xq):
            s = scales + jnp.sum(salt) * 1e-30
            out = bottleneck_block_chained_int8(
                xq, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"],
                q["b2"], q["w3q"], q["sw3"], q["b3"], s,
                h=h, w_sp=h, emit_i8=True, bt=bt)
            return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

        try:
            sec = chained_seconds_per_iter(
                fn, jnp.zeros((8, 8), jnp.float32), iters=args.iters,
                repeats=5, consts=(xr,))
        finally:
            block.VMEM_CAP_BYTES = old
        return sec

    out = {"unix_time": int(time.time()), "rows": []}
    for bt in [int(b) for b in args.bts.split(",")]:
        samples = {"cap16": [], "cap100": []}
        for _ in range(args.pairs):
            for name, cap in (("cap16", 16 * 2**20), ("cap100", 100 * 2**20)):
                try:
                    samples[name].append(measure(cap, bt))
                except Exception as e:
                    samples[name].append(None)
                    print(f"bt={bt} {name}: FAIL {type(e).__name__}", flush=True)
        med = lambda v: (sorted(x for x in v if x)[len([x for x in v if x]) // 2]
                         if any(v) else None)
        row = {"bt": bt,
               "cap16_ms": round(med(samples["cap16"]) * 1e3, 3)
               if med(samples["cap16"]) else None,
               "cap100_ms": round(med(samples["cap100"]) * 1e3, 3)
               if med(samples["cap100"]) else None}
        out["rows"].append(row)
        print(f"bt={bt}: cap16 {row['cap16_ms']} ms vs cap100 "
              f"{row['cap100_ms']} ms", flush=True)
        Path(args.out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    main()
