#!/bin/bash
# Round-4 release tail, take 3. The two r4_release.sh instances raced:
# one waited on a dead endgame pid and started the ensemble search before
# the mask-cache populate had finished; the other would have re-launched
# the seed-14b training on a busy chip. This wrapper serialises correctly:
#   wait for BOTH the seed-14b training queue and the endgame_b populate,
#   redo the int8-vs-orbax end-to-end verify that died on tunnel flaps,
#   then hand off to r4_release.sh stages 2-7 (stage 1 skipped via flag).
set -u
cd /root/repo
TRAIN_PID=${1:?train pid}
ENDGAME_PID=${2:?endgame pid}
DEADLINE=$(date -u -d "today 12:40" +%s)

for pid in "$TRAIN_PID" "$ENDGAME_PID"; do
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

echo "=== int8 verify redo ($(date -u +%H:%M:%S))"
NPZ=artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt.npz
ORB=artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt
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

echo "=== handing off to r4_release.sh stages 2-7 ($(date -u +%H:%M:%S))"
: > /tmp/dead.pid   # empty pid file -> r4_release.sh skips its wait loop
exec bash scripts/r4_release.sh /tmp/dead.pid
