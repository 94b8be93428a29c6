#!/bin/bash
# Queue 6 (after queue5): fixed-timing PPM stage profile, then a solo ppm
# bench to refresh last_good.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue6.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE5 DONE" bench_out/r5_queue5.log 2>/dev/null; do sleep 30; done
run python tools/profile_ppm.py
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> "$LOG"
