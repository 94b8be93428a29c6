#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue2.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 900 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python bench.py san_miguel                                  # HEAD: two-round + new gate + packed glue
run env CTL_TT_TWO_ROUND=0 python bench.py san_miguel           # A/B the two-round prune
run env CTL_V_INCOHERENT=6 CTL_V_COHERENT=6 python bench.py san_miguel
run python bench.py veach_mis                                   # HEAD veach check
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
