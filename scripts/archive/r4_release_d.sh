#!/bin/bash
# Round-4 release tail, take 4. Postmortem of take 3: FOUR orphaned
# r4_release.sh instances (spawned before the endgame rewrite, parented
# to dead pid files) ran concurrent stages on the one chip — one
# rebuilt artifacts/release/ from a 9-member partial cache and deleted
# the committed int8 npz + its Orbax twin that the dtype verify needs.
# All orphans are dead now; this take (a) restores the npz from git and
# verifies against the SAME checkpoint under runs/, (b) also SWAs +
# populates the clean full cw=0.9 run (10h17m08s) so the search sees
# both class-weight lineages, then (c) hands off to r4_release.sh
# stages 2-7 exactly as take 3 did.
set -u
cd /root/repo
TRAIN_PID=${1:?train queue pid}
POP_PID=${2:?populate pid}
DEADLINE=$(date -u -d "today 12:40" +%s)

for pid in "$TRAIN_PID" "$POP_PID"; do
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
      echo "ALARM: wait deadline; proceeding with pid=$pid still alive $(date -u +%H:%M:%S)"
      break 2
    fi
  done
  echo "pid $pid done $(date -u +%H:%M:%S)"
done
touch /tmp/r4_seed14.done

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

echo "=== int8 verify, take 4 ($(date -u +%H:%M:%S))"
NPZ=artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt.npz
ORB=runs/2026-08-19T02h28m05s/model-epoch-016.chkpt
git checkout -- "$NPZ" 2>/dev/null
if [ -f "$NPZ" ] && [ -d "$ORB" ] \
   && [ ! -f artifacts/npz_verify_int8_vs_orbax.json ]; then
  for side in npz orbax; do
    src=$NPZ; [ "$side" = orbax ] && src=$ORB
    for attempt in 1 2 3; do
      until probe; do echo "tunnel down; sleep 120"; sleep 120; done
      timeout 1800 python scripts/make_submission.py "$src" \
        --out "artifacts/npz_verify_$side" >> artifacts/npz_verify.log 2>&1 \
        && break
      echo "$side submission attempt $attempt failed $(date -u +%H:%M:%S)"
      sleep 60
    done
  done
  python - <<'EOF' >> artifacts/npz_verify.log 2>&1
import csv, json
def labels(p):
    with open(p) as f:
        return {r["id"]: r["prediction"] for r in csv.DictReader(f)}
a = labels("artifacts/npz_verify_npz/submission.csv")
b = labels("artifacts/npz_verify_orbax/submission.csv")
agree = sum(a[k] == b[k] for k in a) / len(a)
res = {"int8_vs_orbax_patch_agreement": round(agree, 5), "patches": len(a)}
print(json.dumps(res))
json.dump(res, open("artifacts/npz_verify_int8_vs_orbax.json", "w"))
EOF
  echo "npz verify: $(cat artifacts/npz_verify_int8_vs_orbax.json 2>/dev/null)"
else echo "skip int8 verify (missing inputs or already done)"; fi

echo "=== SWA + populate for the clean cw=0.9 run 10h17m08s ($(date -u +%H:%M:%S))"
D=2026-08-19T10h17m08s
if ls -d "runs/$D"/model-epoch-029.chkpt >/dev/null 2>&1; then
  timeout 900 python scripts/average_checkpoints.py --date "$D" \
    --epochs "24,25,26,27,28,29" --dilated 0 >> artifacts/swa_r4.log 2>&1
  echo "SWA $D exit=$?"
  M=""
  for e in 900 29 27 25 23 21 19 17 15; do
    if [ -d "runs/$D/model-epoch-0$e.chkpt" ] \
       || [ -d "runs/$D/model-epoch-$e.chkpt" ]; then
      M="$M $D:$e"
    fi
  done
  bash scripts/populate_cache_members.sh artifacts/ensemble_r4c $M
  echo "populate $D exit=$?"
else echo "skip ($D incomplete)"; fi

echo "=== handing off to r4_release.sh stages 2-7 ($(date -u +%H:%M:%S))"
: > /tmp/dead.pid
exec bash scripts/r4_release.sh /tmp/dead.pid
