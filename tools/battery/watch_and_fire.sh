#!/bin/bash
# Poll the TPU tunnel; run the measurement battery the moment it's back.
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    echo "UP $(date)" >> /tmp/tpu_watch.log
    bash /tmp/battery.sh > /tmp/battery.log 2>&1
    echo "battery exit=$? $(date)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "down $(date)" >> /tmp/tpu_watch.log
  sleep 150
done
