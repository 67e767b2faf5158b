"""Unattended greedy flag search: find and measure the best serving config.

The per-flag A/B legs give attribution; this leg gives the ANSWER even if
nobody is watching the one chip window: greedily accept each candidate
fused.py flag (resnet50 int8_chain e2e, honest chained harness) when it
wins by >1%, then report the winning combination and its throughput as one
JSON line.  Defaults are still only flipped in code by a human after the
verify_tpu gates pass — this prints the evidence, it does not edit files.

Greedy order is the expected-impact ranking (whole-stage first); each
candidate is evaluated on top of the already-accepted set, so interactions
with earlier winners are captured (a full 2^n sweep is not worth the chip
time at n=4).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import bench_batch, build_int8_chain, fused, time_forward  # noqa: E402

CANDIDATES = [
    ("STAGE_FUSE_PROJ", True),
    ("DS_CONV3_ONEDOT", True),
    ("DS_PAIR_DMA", True),
]

x = bench_batch()
cfg, _, qtree, scales = build_int8_chain("resnet50")

defaults = {k: getattr(fused, k) for k, _ in CANDIDATES}
accepted: dict = {}
try:
    base = time_forward(cfg, qtree, scales, x, iters=16)
    print(f"base (defaults): {base*1e3:.2f} ms -> {256/base:.0f} img/s",
          flush=True)
    best = base
    for name, value in CANDIDATES:
        try:
            setattr(fused, name, value)
            sec = time_forward(cfg, qtree, scales, x, iters=16)
            win = sec < best * 0.99
            print(
                f"{name}={value} (on top of {sorted(accepted) or 'defaults'}):"
                f" {sec*1e3:.2f} ms -> {256/sec:.0f} img/s"
                f" [{'ACCEPT' if win else 'reject'}]",
                flush=True,
            )
            if win:
                accepted[name] = value
                best = sec
            else:
                setattr(fused, name, defaults[name])
        except Exception as e:
            print(f"{name}={value}: FAIL {type(e).__name__}: {e}", flush=True)
            setattr(fused, name, defaults[name])
    print(json.dumps({
        "metric": "resnet50 b256 int8_chain e2e, greedy-best flags",
        "images_per_sec": round(256 / best, 1),
        "ms_per_batch": round(best * 1e3, 3),
        "accepted_flags": accepted,
        "vs_defaults": round(base / best, 4),
    }), flush=True)
finally:
    for k, v in defaults.items():
        setattr(fused, k, v)
