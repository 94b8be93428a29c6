#!/bin/bash
# Queue 9 (after queue8): treelet granularity sweep on san-miguel at HEAD.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue9.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE8 DONE" bench_out/r5_queue8.log 2>/dev/null; do sleep 30; done
run env CTL_TREELET_ROWS=512 python bench.py san_miguel
run env CTL_TREELET_ROWS=1024 python bench.py san_miguel
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=3 python bench.py san_miguel
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=6 python bench.py san_miguel
run python bench.py ppm      # refresh last_good with the fast gather
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> "$LOG"
