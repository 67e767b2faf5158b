#!/bin/bash
# Round-5 chip session: responsiveness-gated queue of every on-chip leg
# VERDICT r4 asks for.  The tunnel goes dark for tens of minutes at a time
# (round 4; observed again 2026-08-20 ~10:40), so each leg fires only
# after a 3-round-trip responsiveness probe passes (watch2.sh's bar), and
# every leg checkpoints its own artifact so a mid-leg stall loses one leg,
# not the session.  Legs are ordered by information value:
#   1 regress kernel A/B  (VERDICT #1: r2-code vs HEAD, copy+L1b1)
#   2 pp_ab               (VERDICT #3: pixel-paired vs standard L1 kernels)
#   3 regress e2e A/B     (VERDICT #1: one e2e round)
#   4 auto_best re-earn   (VERDICT #2/#6: RESNETC_NO_TUNED=1 full pass ->
#                          TUNED.json rewritten under the confirm-pair rule,
#                          incl. L1_PIXEL_PAIR + HYBRID lanes)
#   5 family_bench        (VERDICT #7: resnet18/34/50/152 numbers)
#   6 batch_sweep --train (VERDICT #8a)
#   7 verify_tpu          (Mosaic gate incl. the new pp check)
#   8 roofline_attrib     (VERDICT #5: re-emit with the fixed tool)
#   9 autotune_gemm       (VERDICT #8b: populate _BEST_TILES once)
#  10 bench.py            (VERDICT #4: official headline attempt)
# Usage: bash tools/battery/session_r5.sh >> /tmp/session_r5.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PROBE_SLEEP=180
STATE=/tmp/session_r5.state
touch "$STATE"

probe() {
  timeout -k 10 150 python -c "
import time, jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform == 'tpu'
f = jax.jit(lambda a: a @ a)
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(f(x)[:1, :1])
t0 = time.time()
for _ in range(3):
    np.asarray(f(x)[:1, :1])
dt = time.time() - t0
print(f'probe 3 round trips: {dt:.2f}s', flush=True)
assert dt < 5.0, f'tunnel sluggish: {dt:.1f}s'
" 2>/dev/null
}

wait_responsive() {
  while ! probe; do
    echo "tunnel down/sluggish $(date)"
    sleep "$PROBE_SLEEP"
  done
  echo "tunnel RESPONSIVE $(date)"
}

run_leg() {
  local name="$1" tmo="$2"; shift 2
  grep -qx "$name" "$STATE" && { echo "skip $name (done)"; return 0; }
  wait_responsive
  echo "=== LEG $name start $(date)"
  timeout -k 30 "$tmo" "$@"
  local rc=$?
  echo "=== LEG $name exit=$rc $(date)"
  # A leg that ran to completion (rc=0) is done; a timed-out or failed leg
  # is retried once on the next pass unless marked.
  [ $rc -eq 0 ] && echo "$name" >> "$STATE"
  return $rc
}

for pass in 1 2; do
  echo "#### session_r5 pass $pass $(date)"
  run_leg regress_kernel 2400 python tools/battery/regress_ab.py \
    --rounds 3 --budget-s 2100 --per-call-timeout 600 --what copy,dot,l1b1 \
    --out /root/repo/REGRESS_AB_KERNEL.json
  run_leg pp_ab 2400 python tools/battery/pp_ab.py
  run_leg regress_e2e 3600 python tools/battery/regress_ab.py \
    --rounds 1 --budget-s 3300 --per-call-timeout 1500 --what copy,e2e \
    --out /root/repo/REGRESS_AB_E2E.json
  run_leg auto_best 4200 env RESNETC_NO_TUNED=1 python tools/battery/auto_best.py
  run_leg family 2400 python tools/battery/family_bench.py
  run_leg batch_sweep 2400 python tools/battery/batch_sweep.py --train
  run_leg verify_tpu 3000 python tools/verify_tpu.py
  run_leg roofline 2400 python tools/roofline_attrib.py
  run_leg gemm_autotune 1800 python tools/autotune_gemm.py
  run_leg bench 5400 env RESNETC_BENCH_TUNE_BUDGET_S=1800 python bench.py
done
echo "#### session_r5 ALL PASSES DONE $(date)"
