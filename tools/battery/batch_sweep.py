"""Batch-size sweep: serving (int8_chain + xla) AND the train step.

Every recorded throughput so far is batch 256 — the headline config
(BASELINE.json).  This leg answers whether the engine leaves throughput on
the table at other batch sizes: larger batches amortize per-kernel fixed
costs (grid setup, weight DMA) and fill the MXU better at the small tail
shapes (L4 rows = b*8*8), while smaller ones cut VMEM pressure and latency.
The headline metric stays pinned at b256 for round-over-round
comparability; a measured win here is recorded in PERF.md as a
serving/train-configuration recommendation, not a metric change.

The train leg (--train) closes VERDICT r4 weak #7: training stands at
~2,610 img/s b256 with a measured bwd=2.54x-fwd ceiling (PERF.md r4s3);
the one cheap unmeasured knob is whether b384/512 amortizes better.

Each batch size is measured for all legs in one process, adjacent in time
(the weather drifts on tens-of-minutes timescales — PERF.md round 4).
FLOPs scale linearly with batch, so equal img/s across batches means the
engine is batch-size-neutral; a rising curve means fixed costs still
matter.  Results are persisted to BATCH_SWEEP.json at the repo root
(an unattended run must leave more than stdout — ADVICE r4 #3).

Usage: python tools/battery/batch_sweep.py [--batches 128,256,384,512]
       [--train] [--out BATCH_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from _common import SMOKE, bench_batch, build_int8_chain, time_forward

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from resnetc_tpu.models import resnet  # noqa: E402
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

REPO = Path(__file__).resolve().parents[2]


def time_train_step(cfg, batch: int, steps: int) -> float:
    """Seconds per train step (fwd+bwd+SGD, BN batch stats) at this batch,
    via bench.py's chained-consumption pattern (each step consumes the
    previous state; one host fetch forces completion)."""
    from resnetc_tpu import train as train_mod

    tcfg = train_mod.TrainConfig(lr=0.1, policy_name="bf16")
    ts = train_mod.init_train_state(cfg, jax.random.key(1))
    x = bench_batch(batch)
    y = jnp.asarray(np.arange(batch, dtype=np.int32) % 1000)
    lr = jnp.float32(0.1)

    def run_steps(state, n):
        for _ in range(n):
            state, m = train_mod.train_step(cfg, tcfg, state, x, y, lr)
        return state, float(m["loss"])

    ts, _ = run_steps(ts, 1)  # compile + warm
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, 1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, steps + 1)
    t_many = time.perf_counter() - t0
    return max(t_many - t_one, 1e-9) / steps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument(
        "--batches", default="4,8" if SMOKE else "128,256,384,512"
    )
    ap.add_argument("--iters", type=int, default=2 if SMOKE else 16)
    ap.add_argument("--train", action="store_true",
                    help="also sweep the train step (fwd+bwd+SGD)")
    ap.add_argument("--train-steps", type=int, default=2 if SMOKE else 8)
    ap.add_argument("--out", default=str(REPO / "BATCH_SWEEP.json"))
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    cfg, folded, qtree, scales = build_int8_chain(args.model)
    policy_dtype = jnp.bfloat16

    def xla_fwd(x):
        return resnet.forward_folded(cfg, folded, x.astype(policy_dtype))

    hdr = f"{'batch':>6} {'int8_chain':>22} {'xla bf16':>22}"
    if args.train:
        hdr += f" {'train':>22}"
    print(hdr)
    results = []
    for b in batches:
        x = bench_batch(b)
        row = {"batch": b}
        try:
            sec = time_forward(cfg, qtree, scales, x, iters=args.iters)
            row["int8_chain_img_s"] = round(b / sec, 1)
            chain_s = f"{sec * 1e3:8.2f} ms {b / sec:8.0f} im/s"
        except Exception as e:
            row["int8_chain_error"] = type(e).__name__
            chain_s = f"FAIL {type(e).__name__}"
        try:
            sec = chained_seconds_per_iter(
                xla_fwd, x, iters=min(args.iters, 2) if SMOKE else args.iters,
                repeats=1 if SMOKE else 3,
            )
            row["xla_img_s"] = round(b / sec, 1)
            xla_s = f"{sec * 1e3:8.2f} ms {b / sec:8.0f} im/s"
        except Exception as e:
            row["xla_error"] = type(e).__name__
            xla_s = f"FAIL {type(e).__name__}"
        line = f"{b:>6} {chain_s:>22} {xla_s:>22}"
        if args.train:
            try:
                sec = time_train_step(cfg, b, args.train_steps)
                row["train_img_s"] = round(b / sec, 1)
                line += f" {sec * 1e3:8.2f} ms {b / sec:8.0f} im/s"
            except Exception as e:
                row["train_error"] = type(e).__name__
                line += f" FAIL {type(e).__name__}"
        results.append(row)
        print(line, flush=True)
        # Persist incrementally: the chip window may close mid-sweep.
        Path(args.out).write_text(json.dumps(
            {"model": args.model, "rows": results,
             "unix_time": int(time.time())}, indent=1))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
