#!/bin/bash
# Queue 7 (after queue6): e2e pool-kernel A/B on veach + cornell headline.
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue7.log
: > "$LOG"
run() {
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
while ! grep -q "QUEUE6 DONE" bench_out/r5_queue6.log 2>/dev/null; do sleep 30; done
run python bench.py veach_mis                                    # fixed (HEAD default)
run env CTL_PL_POOL=1 python bench.py veach_mis                  # pool K8 G4
run env CTL_PL_POOL=1 CTL_PL_K=16 python bench.py veach_mis      # pool K16 G4
run env CTL_PL_POOL=1 CTL_PL_K=16 CTL_PL_G=2 python bench.py veach_mis
run env CTL_PL_POOL=1 python bench.py headline                   # cornell e2e
run python bench.py headline
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> "$LOG"
