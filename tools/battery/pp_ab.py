"""Isolated on-chip A/B: pixel-paired vs standard L1 chain kernels.

Measures, paired-interleaved (A,B,A,B medians) in one process:
  - L1b1 identity chain block (b256, 56^2, cin=256, c=64)
  - L1b0 projection block     (b256, 56^2, cin=64,  c=64, ds)
for the standard bottleneck_block_chained_int8 vs the pixel-paired
bottleneck_block_chained_int8_pp, plus a bare-copy weather stamp before
and after.  The pp kernel pays ~+30% MACs (block-diag conv1/conv3) to run
every dot at N=128 with dense kw slots — ROOFLINE r4 put these phases at
0.18-0.30 efficiency, so the bet is that the N-side recovery dominates.

Writes PP_AB.json at the repo root.

Usage: python tools/battery/pp_ab.py [--iters 16] [--repeats 5] [--pairs 3]
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

from resnetc_tpu.ops.pallas.block import (  # noqa: E402
    bottleneck_block_chained_int8,
    bottleneck_block_chained_int8_pp,
    chain_meta,
    quantize_chain_block,
    quantize_ds_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

REPO = Path(__file__).resolve().parents[2]


def build_case(rng, *, cin, with_ds):
    h, c = 56, 64
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    blk = {
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
    }
    q = quantize_chain_block(blk)
    kw = dict(h=h, w_sp=h, emit_i8=True)
    if with_ds:
        qd = quantize_ds_block(
            dict(blk, downsample={"weight": g(cin, c4), "bias": g(c4)})
        )
        kw.update(wdq=qd["wdq"], swd=qd["swd"], bd=qd["bd"])
    scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(rng.integers(-127, 128, (256 * hp * wp, cin)), jnp.int8)
    return xr, q, scales, kw, h


def measure(fn_builder, xr, q, scales, kw, h, *, iters, repeats):
    def step(salt, xq):
        s = scales + jnp.sum(salt) * 1e-30
        out = fn_builder(
            xq, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"], s, **kw)
        return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

    return chained_seconds_per_iter(
        step, jnp.zeros((8, 8), jnp.float32), iters=iters, repeats=repeats,
        consts=(xr,),
    )


def copy_gbs():
    sys.path.insert(0, str(REPO / "tools"))
    from roofline_attrib import measure_copy_rate_gbs

    return round(measure_copy_rate_gbs(256), 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "PP_AB.json"))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    out = {"unix_time": int(time.time()), "copy_gbs_pre": copy_gbs()}
    print(f"weather: {out['copy_gbs_pre']} GB/s", flush=True)

    for name, cin, with_ds in (("L1b1", 256, False), ("L1b0_proj", 64, True)):
        case = build_case(rng, cin=cin, with_ds=with_ds)
        # Parity first (cheap insurance that the chip compiles both the
        # same way interpret mode did).
        xr, q, scales, kw, h = case
        a = bottleneck_block_chained_int8(
            xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"], scales, **kw)
        b = bottleneck_block_chained_int8_pp(
            xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"], scales, **kw)
        match = bool(jnp.array_equal(a, b))
        del a, b
        samples = {"std": [], "pp": []}
        for _ in range(args.pairs):
            samples["std"].append(measure(
                bottleneck_block_chained_int8, *case,
                iters=args.iters, repeats=args.repeats))
            samples["pp"].append(measure(
                bottleneck_block_chained_int8_pp, *case,
                iters=args.iters, repeats=args.repeats))
        med = lambda v: sorted(v)[len(v) // 2]
        row = {
            "bitmatch_on_chip": match,
            "std_ms": round(med(samples["std"]) * 1e3, 3),
            "pp_ms": round(med(samples["pp"]) * 1e3, 3),
            "std_samples_ms": [round(s * 1e3, 3) for s in samples["std"]],
            "pp_samples_ms": [round(s * 1e3, 3) for s in samples["pp"]],
        }
        row["speedup"] = round(row["std_ms"] / row["pp_ms"], 3)
        out[name] = row
        print(f"{name}: std {row['std_ms']} ms vs pp {row['pp_ms']} ms "
              f"({row['speedup']}x) bitmatch={match}", flush=True)
        Path(args.out).write_text(json.dumps(out, indent=1))

    out["copy_gbs_post"] = copy_gbs()
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"weather post: {out['copy_gbs_post']} GB/s; wrote {args.out}")
    return 0


if __name__ == "__main__":
    main()
