"""Inference batch-size sweep: int8_chain + xla e2e img/s at b128-512.

Every recorded throughput so far is batch 256 — the headline config
(BASELINE.json).  This leg answers whether the serving engine leaves
throughput on the table at other batch sizes: larger batches amortize the
per-kernel fixed costs (grid setup, weight DMA) and fill the MXU better at
the small tail shapes (L4 rows = b*8*8), while smaller ones cut VMEM
pressure and latency.  The headline metric stays pinned at b256 for
round-over-round comparability; a measured win here is recorded in
PERF.md as a serving-configuration recommendation, not a metric change.

Each batch size is measured for BOTH backends in one process, adjacent in
time (the weather drifts on tens-of-minutes timescales — PERF.md round 4),
and per-image img/s is printed so sizes are directly comparable.  FLOPs
scale linearly with batch, so equal img/s across batches means the engine
is batch-size-neutral; a rising curve means fixed costs still matter.

Usage: python tools/battery/batch_sweep.py [--batches 128,256,384,512]
"""

from __future__ import annotations

import argparse

from _common import SMOKE, bench_batch, build_int8_chain, time_forward

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from resnetc_tpu.models import resnet  # noqa: E402
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument(
        "--batches", default="4,8" if SMOKE else "128,256,384,512"
    )
    ap.add_argument("--iters", type=int, default=2 if SMOKE else 16)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    cfg, folded, qtree, scales = build_int8_chain(args.model)
    policy_dtype = jnp.bfloat16

    # XLA folded-forward twin for the same sweep (the bf16 backend).
    interp = jax.default_backend() != "tpu"

    def xla_fwd(x):
        return resnet.forward_folded(cfg, folded, x.astype(policy_dtype))

    print(f"{'batch':>6} {'int8_chain':>22} {'xla bf16':>22}")
    results = []
    for b in batches:
        x = bench_batch(b)
        row = {"batch": b}
        try:
            sec = time_forward(cfg, qtree, scales, x, iters=args.iters)
            row["int8_chain"] = b / sec
            chain_s = f"{sec * 1e3:8.2f} ms {b / sec:8.0f} im/s"
        except Exception as e:
            chain_s = f"FAIL {type(e).__name__}"
        try:
            sec = chained_seconds_per_iter(
                xla_fwd, x, iters=min(args.iters, 2) if SMOKE else args.iters,
                repeats=1 if SMOKE else 3,
            )
            row["xla"] = b / sec
            xla_s = f"{sec * 1e3:8.2f} ms {b / sec:8.0f} im/s"
        except Exception as e:
            xla_s = f"FAIL {type(e).__name__}"
        results.append(row)
        print(f"{b:>6} {chain_s:>22} {xla_s:>22}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
