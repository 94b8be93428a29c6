#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue17.log
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 900 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run env BENCH_BUDGET_S=880 python bench.py ppm
run env BENCH_BUDGET_S=880 python bench.py bdpt
echo "QUEUE17 DONE $(date +%H:%M:%S)" >> "$LOG"
