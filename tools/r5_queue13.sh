#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue13.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE12 DONE" bench_out/r5_queue12.log 2>/dev/null; do sleep 30; done
run python tools/microbench_beamgrid.py
echo "QUEUE13 DONE $(date +%H:%M:%S)" >> "$LOG"
