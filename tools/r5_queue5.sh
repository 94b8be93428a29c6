#!/bin/bash
# Queue 5 (after queue4's profile_ppm): fresh treelet stage decomposition at
# HEAD, san-miguel e2e ablation, and the shared-pool kernel A/B.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue5.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
# wait for queue4 to finish before touching the chip (marker-file wait; no
# process-pattern matching)
while ! grep -q "QUEUE4 DONE" bench_out/r5_queue4.log 2>/dev/null; do sleep 30; done
run python tools/microbench_pool.py
run python tools/microbench_tt_stages.py
run python tools/profile_sm.py
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> "$LOG"
