#!/bin/bash
# Queue 8 (after queue7): scatter-unsort A/B (stages + san-miguel e2e) and
# the fixed profile_sm ablation.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue8.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE7 DONE" bench_out/r5_queue7.log 2>/dev/null; do sleep 30; done
run python tools/microbench_tt_stages.py                 # scatter unsort (new default)
run python bench.py san_miguel                           # e2e with scatter unsort
run env CTL_TT_UNSORT=sort python bench.py san_miguel    # e2e control (old impl)
run python tools/profile_sm.py
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> "$LOG"
