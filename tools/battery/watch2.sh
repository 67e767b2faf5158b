#!/bin/bash
# Responsiveness-aware watcher (session 5): the old watcher's probe
# (jax.devices() succeeding) is NECESSARY but not SUFFICIENT — on
# 2026-08-19 the device enumerated fine while dispatch+fetch round trips
# took 7+ seconds each (a battery fired into that window burns hours and
# measures nothing).  This probe times three real dispatch+fetch round
# trips of a tiny precompiled program and requires them to complete fast
# (healthy tunnel RTT is ~25 ms each; the bar is generous at 5 s total).
BATTERY="$(dirname "$(readlink -f "$0")")/battery2.sh"
FIRES=0
while true; do
  if timeout 180 python -c "
import time, jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform == 'tpu'
f = jax.jit(lambda a: a @ a)
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(f(x)[:1, :1])  # compile + first fetch (excluded from the bar)
t0 = time.time()
for _ in range(3):
    np.asarray(f(x)[:1, :1])
dt = time.time() - t0
print(f'probe 3 round trips: {dt:.2f}s', flush=True)
assert dt < 5.0, f'tunnel sluggish: {dt:.1f}s'
" >> /tmp/tpu_watch2.log 2>&1; then
    echo "RESPONSIVE $(date)" >> /tmp/tpu_watch2.log
    FIRES=$((FIRES+1))
    bash "$BATTERY" >> /tmp/battery2.log 2>&1
    echo "battery2 exit=$? fire=$FIRES $(date)" >> /tmp/tpu_watch2.log
    if grep -q "battery2 ALL done" /tmp/battery2.log 2>/dev/null || [ "$FIRES" -ge 3 ]; then
      exit 0
    fi
    echo "battery2 incomplete (fire $FIRES) - resuming watch" >> /tmp/tpu_watch2.log
  else
    echo "down/sluggish $(date)" >> /tmp/tpu_watch2.log
  fi
  sleep 120
done
