#!/bin/bash
# Resilient mask-cache populate: retries through tunnel outages/wedges.
# Each attempt is bounded; cached members are skipped instantly, so a
# killed attempt resumes where it left off. Stops when all members are
# cached or attempts are exhausted.
cd /root/repo
RUNS="2026-08-17T09h11m04s 2026-08-17T11h34m43s 2026-08-17T15h51m43s"
MEMBERS=""
for d in $RUNS; do
  for e in $(seq 14 29); do MEMBERS="$MEMBERS --member $d:$e"; done
done
TARGET=48
for attempt in $(seq 1 30); do
  have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
  echo "=== attempt $attempt: $have/$TARGET cached $(date -u +%H:%M:%S) ==="
  if [ "$have" -ge "$TARGET" ]; then echo "DONE"; exit 0; fi
  timeout 1500 python scripts/ensemble_runs.py $MEMBERS \
    --out artifacts/ensemble_r3_all48 >> artifacts/mask_cache_populate3.log 2>&1
  rc=$?
  echo "attempt $attempt exit=$rc"
  [ $rc -eq 0 ] && { echo "DONE (scored)"; exit 0; }
  sleep 60
done
echo "GAVE UP"
exit 1
