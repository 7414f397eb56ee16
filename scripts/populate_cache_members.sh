#!/bin/bash
# Resilient mask-cache populate for an arbitrary member list.
# Usage: populate_cache_members.sh OUTDIR DATE:EPOCH [DATE:EPOCH ...]
# Retries through tunnel outages/wedges: each attempt is bounded, cached
# members are skipped instantly, so a killed attempt resumes where it
# left off. Stops when ensemble_runs.py completes a full scored pass.
set -u
cd /root/repo
OUT=${1:?usage: populate_cache_members.sh OUTDIR DATE:EPOCH...}
shift
MEMBERS=""
for m in "$@"; do MEMBERS="$MEMBERS --member $m"; done
LOG="${OUT}_populate.log"
for attempt in $(seq 1 30); do
  have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
  echo "=== attempt $attempt: $have cached total $(date -u +%H:%M:%S) ==="
  timeout 2400 python scripts/ensemble_runs.py $MEMBERS --out "$OUT" \
    >> "$LOG" 2>&1
  rc=$?
  echo "attempt $attempt exit=$rc"
  [ $rc -eq 0 ] && { echo "DONE (scored)"; exit 0; }
  sleep 60
done
echo "GAVE UP"
exit 1
