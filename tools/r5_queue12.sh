#!/bin/bash
# Queue 12 (after queue11): push the V sweep down + coherent budget.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue12.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE11 DONE" bench_out/r5_queue11.log 2>/dev/null; do sleep 30; done
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=2 python bench.py san_miguel
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=3 CTL_V_COHERENT=4 python bench.py san_miguel
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=3 CTL_V_COHERENT=3 python bench.py san_miguel
run env CTL_TREELET_ROWS=768 CTL_V_INCOHERENT=3 python bench.py san_miguel
echo "QUEUE12 DONE $(date +%H:%M:%S)" >> "$LOG"
