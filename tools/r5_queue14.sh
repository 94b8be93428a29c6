#!/bin/bash
# Queue 14 (after queue13): scatter slotfill A/B — stages + san-miguel e2e.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue14.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE13 DONE" bench_out/r5_queue13.log 2>/dev/null; do sleep 30; done
run python tools/microbench_tt_stages.py                      # scatter slotfill
run python bench.py san_miguel                                # e2e, defaults
run env CTL_TREELET_ROWS=512 CTL_V_INCOHERENT=3 python bench.py san_miguel
echo "QUEUE14 DONE $(date +%H:%M:%S)" >> "$LOG"
