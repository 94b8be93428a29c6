#!/bin/bash
# Retry a FULL bench capture through tunnel flaps: probe cheaply, and only
# launch the full run once a probe passes. 2h deadline.
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + 7200 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 110 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((128, 2048), np.float32))
print(float(jax.jit(lambda v: v.sum())(x)))" > /dev/null 2>&1; then
    timeout 3000 python bench.py > bench_out/r5_full4.json 2> bench_out/r5_full4.err
    # success = a real value for san_miguel (not just stale records)
    if python3 -c "
import json,sys
ok=False
for l in open('bench_out/r5_full4.json'):
    try: r=json.loads(l)
    except: continue
    if 'san-miguel' in str(r.get('metric','')) and r.get('value'): ok=True
sys.exit(0 if ok else 1)"; then exit 0; fi
  fi
  sleep 120
done
