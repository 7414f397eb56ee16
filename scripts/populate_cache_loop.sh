#!/bin/bash
# Resilient mask-cache populate: retries through tunnel outages/wedges.
# Each cycle first probes the TPU with a cheap bounded op; only a healthy
# tunnel gets the (expensive: restore + compile + predict) populate
# attempt. Cached members skip instantly, so killed attempts resume
# where they left off. Stops when all members are cached and scored.
cd /root/repo
RUNS="2026-08-17T09h11m04s 2026-08-17T11h34m43s 2026-08-17T15h51m43s"
MEMBERS=""
for d in $RUNS; do
  for e in $(seq 14 29); do MEMBERS="$MEMBERS --member $d:$e"; done
done
TARGET=48
for cycle in $(seq 1 200); do
  have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
  echo "=== cycle $cycle: $have/$TARGET cached $(date -u +%H:%M:%S) ==="
  if [ "$have" -ge "$TARGET" ]; then echo "ALL CACHED"; fi
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
  if [ $? -ne 0 ]; then
    echo "tunnel down (probe failed); sleeping 60s"
    sleep 60
    continue
  fi
  echo "tunnel OK; populate attempt $(date -u +%H:%M:%S)"
  timeout 3000 python scripts/ensemble_runs.py $MEMBERS \
    --out artifacts/ensemble_r3_all48 >> artifacts/mask_cache_populate3.log 2>&1
  rc=$?
  echo "attempt exit=$rc"
  [ $rc -eq 0 ] && { echo "DONE (scored)"; exit 0; }
  sleep 30
done
echo "GAVE UP"
exit 1
