#!/bin/bash
# Queue 4: populate last_good for every config (full bench main), then the
# never-run per-stage PPM profile.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue4.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run env BENCH_BUDGET_S=3000 python bench.py
run python tools/profile_ppm.py
echo "QUEUE4 DONE $(date +%H:%M:%S)" >> "$LOG"
