#!/bin/bash
# Round-5b persistent queue: land PPM fresh at HEAD, then the never-swept
# phase-2 block-size A/B (CTL_TT_K2/G2), then a final full bench — retrying
# each item through tunnel flaps until it lands or the deadline passes.
# Evidence -> bench_out/r5_queue19.log
cd "$(dirname "$0")/.."
LOG=bench_out/r5_queue19.log
DEADLINE=$(( $(date +%s) + 10800 ))
ITEMS=(
  "ppm|"
  "san_miguel|CTL_TT_K2=4 CTL_TT_G2=2"
  "san_miguel|CTL_TT_K2=2 CTL_TT_G2=4"
  "san_miguel|CTL_TT_K2=4 CTL_TT_G2=4"
  "san_miguel|CTL_TT_K2=1 CTL_TT_G2=2"
  "san_miguel|CTL_TT_K2=2 CTL_TT_G2=1"
)
declare -A done
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  all=1
  for item in "${ITEMS[@]}"; do
    [ "${done[$item]}" = 1 ] && continue
    all=0
    cfg="${item%%|*}"; env_s="${item#*|}"
    echo "=== $(date +%H:%M:%S) env $env_s python bench.py $cfg ===" >> "$LOG"
    env $env_s BENCH_BUDGET_S=880 timeout 900 python bench.py "$cfg" >> "$LOG" 2>&1
    rc=$?
    echo "--- rc=$rc ---" >> "$LOG"
    if [ $rc -eq 0 ] && tail -5 "$LOG" | grep -q '"value": [0-9]'; then
      done[$item]=1
    else
      sleep 90
    fi
  done
  [ $all -eq 1 ] && { echo "QUEUE19 DONE $(date +%H:%M:%S)" >> "$LOG"; exit 0; }
done
echo "QUEUE19 DEADLINE $(date +%H:%M:%S)" >> "$LOG"
