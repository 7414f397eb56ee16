#!/bin/bash
# Round-4 endgame, take 2. The original r4_endgame.sh listed Orbax
# checkpoint DIRECTORIES with plain `ls` (no -d), so every epoch number
# came back with a ":" header suffix and the integer guards skipped all
# SWA members and would have emptied the populate member list. This
# script redoes SWA (CPU-only, safe alongside the running train bench),
# waits for the in-flight stage-2 bench, then runs the remaining stages
# with the fixed `ls -d` enumeration.
set -u
cd /root/repo

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}
now() { date -u +%s; }
CUT_BENCH=${CUT_BENCH:-$(date -u -d "today 10:40" +%s)}
CUT_POP=${CUT_POP:-$(date -u -d "today 12:30" +%s)}
OLD=2026-08-19T02h28m05s
fresh=$(ls -td runs/2026-* 2>/dev/null | grep -v "$OLD" | xargs -rn1 basename)
echo "fresh lineages: $fresh"
echo $$ > /tmp/endgame_b.pid

epochs_of() {  # $1 = run dir name; prints sorted epoch numbers
  ls -d "runs/$1"/model-epoch-*.chkpt 2>/dev/null \
    | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n
}

echo "=== 1b. SWA epoch-900 members, fixed ($(date -u +%H:%M:%S))"
for d in $fresh; do
  last=$(epochs_of "$d" | awk '$1 < 900' | tail -1)
  if [ -n "$last" ] && [ "$last" -ge 25 ]; then
    if [ -d "runs/$d/model-epoch-900.chkpt" ]; then
      echo "SWA $d already exists"
    else
      timeout 900 python scripts/average_checkpoints.py --date "$d" \
        --epochs "24,25,26,27,28,29" --dilated 0 \
        >> artifacts/swa_r4.log 2>&1
      echo "SWA $d exit=$?"
    fi
  else
    echo "SWA $d skipped (last epoch ${last:-none})"
  fi
done

WAIT_PID=$(cat /tmp/benchtrain.pid 2>/dev/null)
echo "waiting for stage-2 train bench pid=$WAIT_PID..."
waited=0
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30; waited=$((waited + 30))
  [ $((waited % 600)) -eq 0 ] && echo "still waiting after ${waited}s $(date -u +%H:%M:%S)"
  [ "$waited" -ge 3000 ] && { echo "ALARM: bench wait deadline; proceeding"; break; }
done
echo "train bench done ($(date -u +%H:%M:%S))"
grep -h '^{' artifacts/bench_train_r4_pad8.jsonl 2>/dev/null

echo "=== 3. inference benches: full-image + pad8 ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_BENCH" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_FULL_IMAGE=1 timeout 1800 python bench.py \
    > artifacts/bench_r4_fullimage.json 2>&1
  echo "full-image exit=$?"; tail -1 artifacts/bench_r4_fullimage.json
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_CONV_IMPL=pad8 timeout 1800 python bench.py \
    > artifacts/bench_r4_pad8.json 2>&1
  echo "pad8 inference exit=$?"; tail -1 artifacts/bench_r4_pad8.json
else echo "skip (past cutoff)"; fi

echo "=== 4. npz int8 end-to-end verify ($(date -u +%H:%M:%S))"
NPZ=artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt.npz
ORB=artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt
if [ -f "$NPZ" ] && [ -d "$ORB" ] \
   && [ ! -f artifacts/npz_verify_int8_vs_orbax.json ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 python scripts/make_submission.py "$NPZ" \
    --out artifacts/npz_verify_int8 >> artifacts/npz_verify.log 2>&1
  echo "npz submission exit=$?"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 python scripts/make_submission.py "$ORB" \
    --out artifacts/npz_verify_orbax >> artifacts/npz_verify.log 2>&1
  echo "orbax submission exit=$?"
  python - <<'EOF' >> artifacts/npz_verify.log 2>&1
import csv, json
def labels(p):
    with open(p) as f:
        return {r["id"]: r["prediction"] for r in csv.DictReader(f)}
a = labels("artifacts/npz_verify_int8/submission.csv")
b = labels("artifacts/npz_verify_orbax/submission.csv")
agree = sum(a[k] == b[k] for k in a) / len(a)
res = {"int8_vs_orbax_patch_agreement": round(agree, 5), "patches": len(a)}
print(json.dumps(res))
json.dump(res, open("artifacts/npz_verify_int8_vs_orbax.json", "w"))
EOF
  echo "npz verify: $(cat artifacts/npz_verify_int8_vs_orbax.json 2>/dev/null)"
else echo "skip (missing npz/orbax or already verified)"; fi

echo "=== 5. mask-cache populate, fixed enumeration ($(date -u +%H:%M:%S))"
MEMBERS=""
for d in $fresh; do
  for e in $(epochs_of "$d"); do
    [ "$e" -ge 14 ] && MEMBERS="$MEMBERS $d:$e"
  done
done
for e in 13 14 15 16 17 18; do MEMBERS="$MEMBERS $OLD:$e"; done
echo "populate members:$MEMBERS"
if [ "$(now)" -lt "$CUT_POP" ]; then
  bash scripts/populate_cache_members.sh artifacts/ensemble_r4 $MEMBERS
  echo "populate exit=$?"
else echo "skip (past cutoff)"; fi

echo "=== endgame_b done ($(date -u +%H:%M:%S))"
