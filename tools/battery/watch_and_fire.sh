#!/bin/bash
# Poll the TPU tunnel; run the measurement battery the moment it's back.
# Canonical battery: this directory's battery.sh (survives /tmp wipes).
BATTERY="$(dirname "$(readlink -f "$0")")/battery.sh"
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    echo "UP $(date)" >> /tmp/tpu_watch.log
    bash "$BATTERY" > /tmp/battery.log 2>&1
    echo "battery exit=$? $(date)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "down $(date)" >> /tmp/tpu_watch.log
  sleep 150
done
