#!/bin/bash
# Round-4 TPU battery (canonical copy: /root/repo/tools/battery/battery.sh): runs unattended the moment the chip is back.
# Order: most-important artifacts first in case the machine flakes mid-run —
# health probe, then the OFFICIAL self-tuning bench (bench.py now A/Bs the
# armed flags itself, parity-gated), then the on-chip Mosaic gate, then
# attribution/sweep legs.  Artifacts are preserved by an EXIT trap, so a
# mid-run tunnel death still commits whatever was measured.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
log() { echo "=== $1 ($(date)) ==="; }

preserve() {
  log "preserve artifacts in-repo (EXIT trap: runs even on mid-battery death)"
  cp /tmp/bench_r4.json /root/repo/BENCH_battery_r04.json 2>/dev/null || true
  # /tmp/battery.log exists only under watch_and_fire's redirect and is
  # still being appended — the copy misses these trailing lines only.
  cp /tmp/battery.log /root/repo/BATTERY_r04.log 2>/dev/null || true
  # git add per file: a single multi-path add is all-or-nothing (one missing
  # pathspec stages NOTHING and exits 128 — r4 review finding).
  (cd /root/repo \
   && { for f in BATTERY_r04.log BENCH_battery_r04.json VERIFY_TPU.json TUNED.json; do
          git add "$f" 2>/dev/null || true
        done; } \
   && git commit -q -m "Battery r04: on-chip measurement artifacts (unattended)" \
   || true)
}
trap preserve EXIT

log "health"
RESNETC_NO_TUNED=1 timeout 1200 python /root/repo/tools/battery/health.py
log "official self-tuning bench (the headline artifact; parity-gated flag A/B inside)"
# 9000s: 5 backend builds + measures, up to ~1800s of tuning (budget checked
# BETWEEN candidates, so one slow Mosaic compile can overshoot), tuned
# re-measure, latency, training — the old 5400s covered bench alone.
RESNETC_BENCH_TUNE_BUDGET_S=1800 timeout 9000 python bench.py | tee /tmp/bench_r4.json
preserve
log "on-chip Mosaic parity gate"
# NO_TUNED on the gate + every attribution leg below: auto_best may write
# TUNED.json mid-battery and fresh python processes would silently inherit
# the overlay, shifting flags-off baselines (r4 session-2 review finding).
RESNETC_NO_TUNED=1 timeout 5400 python tools/verify_tpu.py
preserve
log "greedy best-config search -> persist winners to TUNED.json"
timeout 4800 python /root/repo/tools/battery/auto_best.py
preserve
log "A/B whole-stage L1 + bt sweep"
RESNETC_NO_TUNED=1 timeout 4800 python /root/repo/tools/battery/ab_stage.py
log "stem cin-pad + precision experiments"
RESNETC_NO_TUNED=1 timeout 2400 python /root/repo/tools/battery/stem_pad.py
log "flag e2e sweeps (stem cin-pad / basic-ds / run-fuse)"
RESNETC_NO_TUNED=1 timeout 7200 python /root/repo/tools/battery/flag_e2e.py
log "ds-kernel phase attribution"
RESNETC_NO_TUNED=1 timeout 4800 python tools/probe_ds_phases.py --shape all
log "ds gather DMA pattern A/B"
RESNETC_NO_TUNED=1 timeout 3600 python tools/probe_ds_dma.py
# ds_pair_ab leg removed (r4 review): its isolated sweep is a strict
# subset of ds_onedot_ab's pair x onedot matrix, and the e2e pair A/B is
# covered by auto_best + the verify_tpu pair bit-match gate.  The script
# stays available for manual runs.
log "ds conv3-onedot kernel A/B (isolated 2x2 + e2e)"
RESNETC_NO_TUNED=1 timeout 4800 python /root/repo/tools/battery/ds_onedot_ab.py
log "int8 calibration A/B (absmax vs percentile, real-fixture mix)"
RESNETC_NO_TUNED=1 timeout 3600 python /root/repo/tools/battery/calib_ab.py
log "train batch-size sweep"
RESNETC_NO_TUNED=1 timeout 2400 python tools/profile_train.py --batch 384 --iters 6
RESNETC_NO_TUNED=1 timeout 2400 python tools/profile_train.py --batch 512 --iters 6
log "train backward attribution"
RESNETC_NO_TUNED=1 timeout 3600 python tools/probe_train_bwd.py
log "gemm autotune"
RESNETC_NO_TUNED=1 timeout 5400 python tools/autotune_gemm.py
log "battery ALL done"
