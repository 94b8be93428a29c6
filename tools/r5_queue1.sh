#!/bin/bash
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue1.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python bench.py san_miguel                                  # new glue, V4/6 defaults
run env CTL_V_INCOHERENT=6 CTL_V_COHERENT=6 python bench.py san_miguel
run env CTL_V_INCOHERENT=8 CTL_V_COHERENT=8 python bench.py san_miguel
run python -u tools/microbench_util.py                          # veach lane utilization
run python -u tools/microbench_tt_stages.py                     # glue decomposition at new code
echo "QUEUE1 DONE $(date +%H:%M:%S)" >> "$LOG"
