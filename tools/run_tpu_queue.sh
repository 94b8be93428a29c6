#!/bin/bash
# Round-4 TPU measurement queue: run everything pending in one tunnel-up
# window, each step bounded, all output appended to bench_out/tpu_queue.log.
cd "$(dirname "$0")/.."
LOG=bench_out/tpu_queue.log
mkdir -p bench_out
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 700 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
# 0. liveness (H2D specifically — the outage mode keeps tiny probes alive)
timeout 110 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((128, 2048), np.float32))
print('H2D OK', float(jax.jit(lambda v: v.sum())(x)))" >> "$LOG" 2>&1 || {
  echo "TUNNEL STILL DOWN $(date +%H:%M:%S)" >> "$LOG"; exit 1; }
# 1. VMEM-kernel sort A/B (veach bounce rays)
run python -u tools/microbench_sort.py
# 2. veach e2e with the sort ON (vs 17.63 baseline without)
run env CTL_SORT_INCOHERENT=1 python bench.py veach_mis
# 3. san-miguel decomposition with the looped profiler
run python -u tools/profile_pt.py sanmiguel
# 4. san-miguel e2e current state
run python bench.py san_miguel
# 5. treelet size A/B on san-miguel
run env CTL_TREELET_ROWS=512 python bench.py san_miguel
run env CTL_TREELET_ROWS=1024 python bench.py san_miguel
echo "QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
