#!/bin/bash
# Poll the axon tunnel; when H2D works, run queue15 once and exit.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue15.log
for i in $(seq 1 60); do
  if timeout 110 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((128, 2048), np.float32))
print('H2D OK', float(jax.jit(lambda v: v.sum())(x)))" >> "$LOG" 2>&1; then
    echo "TUNNEL BACK $(date +%H:%M:%S), running queue" >> "$LOG"
    bash tools/run_r5_queue15.sh
    exit 0
  fi
  echo "probe $i down $(date +%H:%M:%S)" >> "$LOG"
  sleep 120
done
echo "WATCHER GAVE UP $(date +%H:%M:%S)" >> "$LOG"
