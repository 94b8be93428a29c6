#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue3.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python bench.py san_miguel                                  # HEAD (two-round on), warm cache now
run env CTL_BENCH_WF=1 python bench.py san_miguel               # regenerating wavefront A/B
run env CTL_TT_TWO_ROUND=0 python bench.py san_miguel           # two-round prune A/B
run env CTL_BENCH_WF=1 python bench.py veach_mis                # wavefront on veach (lane utilization)
run python bench.py ppm                                         # the never-captured config, generous timeout
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
