#!/bin/bash
# Resilient mask-cache populate: retries through tunnel outages/wedges.
# Each cycle first probes the TPU with a cheap bounded op; only a healthy
# tunnel gets the (expensive: restore + compile + predict) populate
# attempt. Cached members skip instantly, so killed attempts resume
# where they left off. Stops when all members are cached and scored.
#
# Member order = expected parity value per TPU-minute:
#   1. SWA (epoch-900) members of the three non-dilated runs — param
#      averages of epochs 24-29, usually the strongest single members;
#   2. late epochs (19-29) of the three non-dilated runs, interleaved
#      so a short healthy window spreads coverage across lineages;
#   3. earlier epochs + dilated-lineage members (SWA + late epochs) for
#      ensemble diversity.
cd /root/repo
ND="2026-08-17T09h11m04s 2026-08-17T11h34m43s 2026-08-17T15h51m43s"
MEMBERS=""
for d in $ND; do MEMBERS="$MEMBERS --member $d:900"; done
for e in $(seq 19 29); do
  for d in $ND; do MEMBERS="$MEMBERS --member $d:$e"; done
done
for e in $(seq 14 18); do
  for d in $ND; do MEMBERS="$MEMBERS --member $d:$e"; done
done
MEMBERS="$MEMBERS --member 2026-08-17T08h21m41s:900"
MEMBERS="$MEMBERS --member 2026-08-16T19h36m49s:900"
for e in 27 28 29; do MEMBERS="$MEMBERS --member 2026-08-17T08h21m41s:$e"; done
for e in 27 28 29; do MEMBERS="$MEMBERS --member 2026-08-16T19h36m49s:$e"; done
TARGET=63
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
    --out artifacts/ensemble_r3_all >> artifacts/mask_cache_populate3.log 2>&1
  rc=$?
  echo "attempt exit=$rc"
  [ $rc -eq 0 ] && { echo "DONE (scored)"; exit 0; }
  sleep 30
done
echo "GAVE UP"
exit 1
