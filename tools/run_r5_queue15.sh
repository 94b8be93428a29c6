#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue15.log
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 700 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
timeout 110 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((128, 2048), np.float32))
print('H2D OK', float(jax.jit(lambda v: v.sum())(x)))" >> "$LOG" 2>&1 || {
  echo "TUNNEL DOWN $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
run python bench.py san_miguel
run python bench.py ppm
echo "QUEUE15 DONE $(date +%H:%M:%S)" >> "$LOG"
