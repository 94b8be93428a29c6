#!/bin/bash
# Queue 11 (after queue10): finer dest-stage cuts.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue11.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE10 DONE" bench_out/r5_queue10.log 2>/dev/null; do sleep 30; done
run python tools/microbench_tt_stages.py
echo "QUEUE11 DONE $(date +%H:%M:%S)" >> "$LOG"
