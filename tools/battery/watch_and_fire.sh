#!/bin/bash
# Poll the TPU tunnel; run the measurement battery the moment it's back.
# Canonical battery: this directory's battery.sh (survives /tmp wipes).
# Re-fires on a flaky window: if the battery dies before "battery ALL done"
# (tunnel flap mid-run), resume polling and fire again — bounded at 3 fires
# so a pathological flap can't burn the chip all day.  Partial artifacts are
# safe either way (battery.sh preserves+commits via an EXIT trap), and the
# persistent XLA compile cache makes re-runs much cheaper.
BATTERY="$(dirname "$(readlink -f "$0")")/battery.sh"
FIRES=0
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    echo "UP $(date)" >> /tmp/tpu_watch.log
    FIRES=$((FIRES+1))
    bash "$BATTERY" >> /tmp/battery.log 2>&1
    echo "battery exit=$? fire=$FIRES $(date)" >> /tmp/tpu_watch.log
    if grep -q "battery ALL done" /tmp/battery.log 2>/dev/null || [ "$FIRES" -ge 3 ]; then
      exit 0
    fi
    echo "battery incomplete (fire $FIRES) - resuming watch" >> /tmp/tpu_watch.log
  else
    echo "down $(date)" >> /tmp/tpu_watch.log
  fi
  sleep 150
done
