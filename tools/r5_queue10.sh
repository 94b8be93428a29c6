#!/bin/bash
# Queue 10 (after queue9): full san-miguel ablation (fixed mock + NEE split).
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue10.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE9 DONE" bench_out/r5_queue9.log 2>/dev/null; do sleep 30; done
run python tools/profile_sm.py
echo "QUEUE10 DONE $(date +%H:%M:%S)" >> "$LOG"
