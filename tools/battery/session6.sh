#!/bin/bash
# Session-6 chip legs, most-decisive first (EXIT trap preserves artifacts):
#   1. health          - weather stamp
#   2. pipe_ab         - CHAIN_PIPE_DMA isolated kernel A/B (the session's
#                        experiment: does manualizing BOTH row streams
#                        unlock the DMA/compute overlap?)
#   3. verify_tpu      - 22-check gate (pipe check removed: closed negative)
#   4. roofline_attrib - per-phase measured vs same-window floors
#                        (VERDICT r3 #2's alternative deliverable)
#   5. flag e2e        - CHAIN_PIPE_DMA e2e paired A/B via auto_best's
#                        engine (writes TUNED.json only on a gated win)
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
log() { echo "=== $1 ($(date)) ==="; }

preserve() {
  log "preserve session-6 artifacts (EXIT trap)"
  (cd /root/repo \
   && { for f in ROOFLINE.json VERIFY_TPU.json TUNED.json SESSION6.log; do
          git add "$f" 2>/dev/null || true
        done; } \
   && git commit -q -m "Session-6 on-chip measurement artifacts (unattended)" \
   || true)
}
trap preserve EXIT

log "health"
RESNETC_NO_TUNED=1 timeout 1800 python tools/battery/health.py
log "pipe_ab (isolated kernel A/B)"
RESNETC_NO_TUNED=1 timeout 3600 python tools/battery/pipe_ab.py --mdma
log "verify gate (22 checks)"
RESNETC_NO_TUNED=1 timeout 5400 python tools/verify_tpu.py
preserve
log "roofline attribution"
timeout 3600 python tools/roofline_attrib.py
preserve
log "CHAIN_PIPE_DMA e2e paired A/B (auto_best single-candidate)"
RESNETC_AUTOBEST_ONLY=CHAIN_PIPE_DMA timeout 3600 python tools/battery/auto_best.py
log "session6 ALL done"
