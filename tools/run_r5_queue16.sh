#!/bin/bash
# Persistent round-5 queue: retry each config through tunnel flaps until it
# lands (rc=0) or the 2h deadline passes. Evidence -> bench_out/r5_queue16.log
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue16.log
DEADLINE=$(( $(date +%s) + 7200 ))
declare -A done
CONFIGS=("san_miguel" "ppm")
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  all=1
  for c in "${CONFIGS[@]}"; do
    [ "${done[$c]}" = 1 ] && continue
    all=0
    echo "=== $(date +%H:%M:%S) python bench.py $c ===" >> "$LOG"
    timeout 700 python bench.py "$c" >> "$LOG" 2>&1
    rc=$?
    echo "--- rc=$rc ---" >> "$LOG"
    if [ $rc -eq 0 ] && tail -5 "$LOG" | grep -q '"value"'; then
      done[$c]=1
    else
      sleep 90
    fi
  done
  [ $all -eq 1 ] && { echo "QUEUE16 DONE $(date +%H:%M:%S)" >> "$LOG"; exit 0; }
done
echo "QUEUE16 DEADLINE $(date +%H:%M:%S)" >> "$LOG"
