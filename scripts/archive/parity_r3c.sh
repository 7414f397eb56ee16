#!/bin/bash
# Round-3c parity stage: runs after followup_perf_r3b.sh releases the
# chip. Adds the dilated run's members to the mask cache (the endgame
# populated the cache before that run existed), re-searches, then runs
# the two prepared host-side parity levers (spatial smoothing,
# cross-generation label fusion) and records every measurement. The
# release refresh stays with finalize_parity (mask-mean semantics); a
# fusion winner is recorded as an artifact for an explicit wiring
# decision, not silently shipped.
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/followup.pid}" 2>/dev/null)
echo "waiting for pid=$WAIT_PID..."
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "chip free $(date -u +%H:%M:%S)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

echo "=== 1. dilated members into the cache (SWA + epochs 20-29)"
# the geometry sidecar lives inside each checkpoint directory
DDIR=$(for d in runs/2026-08-18*/model-epoch-029.chkpt; do
  grep -q '"dilated_layers": true' "$d/geometry.json" 2>/dev/null \
    && basename "$(dirname $d)"; done | head -1)
echo "dilated run: '$DDIR'"
if [ -n "$DDIR" ]; then
  timeout 900 python scripts/average_checkpoints.py --date "$DDIR" \
    --dilated 1 --epochs 24-29 --out_epoch 900 >> artifacts/swa_r3b.log 2>&1
  MEMBERS="$DDIR:900"
  for e in $(seq 20 29); do MEMBERS="$MEMBERS $DDIR:$e"; done
  for cycle in 1 2 3 4 5 6; do
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    bash scripts/populate_cache_members.sh artifacts/ensemble_r3c $MEMBERS \
      >> artifacts/populate_r3c.log 2>&1 && break
    echo "populate attempt $cycle failed; retrying"
    sleep 60
  done
fi

echo "=== 2. re-search + release refresh over the full cache"
timeout 2400 python scripts/finalize_parity.py --max_k 14 \
  > artifacts/finalize_parity_r3c.log 2>&1
echo "finalize exit=$?"
tail -2 artifacts/finalize_parity_r3c.log

echo "=== 3. spatial smoothing sweep (best subset)"
timeout 900 python scripts/smooth_sweep.py \
  --out artifacts/smooth_sweep_r3c.json > artifacts/smooth_sweep_r3c.log 2>&1
echo "smooth exit=$?"
tail -1 artifacts/smooth_sweep_r3c.log

echo "=== 4. cross-generation label fusion"
# (a) best mask subset votes + the old 3-lineage ensemble CSV, weight sweep
for w in 1 2 4 6; do
  timeout 900 python scripts/label_fuse.py \
    --csv "artifacts/ensemble_final_old_r3.csv:$w" --members auto \
    --out "artifacts/label_fuse_r3c_w$w.json" \
    >> artifacts/label_fuse_r3c.log 2>&1
  echo "fuse w=$w exit=$? $(python -c "
import json; print(json.load(open('artifacts/label_fuse_r3c_w$w.json'))['selected']['agreement'])" 2>/dev/null)"
done
# (b) every cached mask votes + old CSV
timeout 1800 python scripts/label_fuse.py \
  --csv artifacts/ensemble_final_old_r3.csv:6 --members all \
  --out artifacts/label_fuse_r3c_all.json \
  >> artifacts/label_fuse_r3c.log 2>&1
echo "fuse all exit=$?"
echo "PARITY R3C DONE $(date -u +%H:%M:%S)"
