#!/bin/bash
# Round-4 endgame queue. Waits for the seed-training chain to free the
# chip, then runs the round's queued measurements in strict priority
# order, each stage gated on a wall-clock cutoff (UTC) and every wait
# deadline-guarded with alarm lines (round-3 postmortem: two silent
# "waiting for pid" deaths ate the round's measurements).
#
#   1. SWA members (epoch-900) for every fresh lineage
#   2. pad8 + grad-accum train benches (VERDICT r3 tasks 4-5)
#   3. full-image + pad8 inference benches (VERDICT r3 task 4)
#   4. int8/fp16 npz end-to-end verify (VERDICT r3 task 3)
#   5. mask-cache populate: all lineages' late epochs + SWA
#
# The release rebuild (search -> package -> fuse -> fresh-clone verify)
# is interactive judgment and runs from the driver session afterwards.
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/trainq.pid}" 2>/dev/null)
WAIT_DEADLINE=${WAIT_DEADLINE:-14400}
echo "waiting for training chain pid=$WAIT_PID (deadline ${WAIT_DEADLINE}s)..."
waited=0
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 60; waited=$((waited + 60))
  [ $((waited % 600)) -eq 0 ] && echo "still waiting on pid=$WAIT_PID after ${waited}s $(date -u +%H:%M:%S)"
  if [ "$waited" -ge "$WAIT_DEADLINE" ]; then
    echo "ALARM: wait deadline exceeded; proceeding anyway $(date -u +%H:%M:%S)"
    break
  fi
done
echo "chip free $(date -u +%H:%M:%S)"
echo $$ > /tmp/endgame.pid

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}
now() { date -u +%s; }
CUT_BENCH=${CUT_BENCH:-$(date -u -d "today 10:30" +%s)}
CUT_POP=${CUT_POP:-$(date -u -d "today 12:30" +%s)}

# fresh lineages = run dirs created by this round's queue (mtime newer
# than the surviving 02h28m05s lineage), each with >= epoch-25 saved
OLD=2026-08-19T02h28m05s
fresh=$(ls -td runs/2026-* 2>/dev/null | grep -v "$OLD" | xargs -rn1 basename)
echo "fresh lineages: $fresh"

echo "=== 1. SWA epoch-900 members ($(date -u +%H:%M:%S))"
for d in $fresh; do
  last=$(ls "runs/$d"/model-epoch-0*.chkpt 2>/dev/null \
         | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n | tail -1)
  if [ -n "$last" ] && [ "$last" -ge 25 ]; then
    timeout 900 python scripts/average_checkpoints.py --date "$d" \
      --epochs "24,25,26,27,28,29" --dilated 0 \
      >> artifacts/swa_r4.log 2>&1
    echo "SWA $d exit=$?"
  else
    echo "SWA $d skipped (last epoch ${last:-none})"
  fi
done

echo "=== 2. train benches: pad8 + accum composition ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_BENCH" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 2400 python scripts/bench_train.py --dilated 0 --batch 8 \
    --variants noremat,pad8 > artifacts/bench_train_r4_pad8.jsonl 2>&1
  echo "pad8 train exit=$?"; grep -h '^{' artifacts/bench_train_r4_pad8.jsonl
else echo "skip (past cutoff)"; fi

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
if [ -f "$NPZ" ] && [ -d "$ORB" ]; then
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
else echo "skip (missing npz or orbax member)"; fi

echo "=== 5. mask-cache populate ($(date -u +%H:%M:%S))"
MEMBERS=""
for d in $fresh; do
  for e in $(ls "runs/$d"/model-epoch-*.chkpt 2>/dev/null \
             | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n); do
    [ "$e" -ge 14 ] && MEMBERS="$MEMBERS $d:$e"
  done
done
for e in 13 14 15 16 17 18; do MEMBERS="$MEMBERS $OLD:$e"; done
echo "populate members:$MEMBERS"
if [ "$(now)" -lt "$CUT_POP" ]; then
  bash scripts/populate_cache_members.sh artifacts/ensemble_r4 $MEMBERS
  echo "populate exit=$?"
else echo "skip (past cutoff)"; fi

echo "=== endgame done ($(date -u +%H:%M:%S))"
