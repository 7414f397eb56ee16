#!/bin/bash
# Round-4 release tail, take 5 — relaunch after the THIRD VM reset.
# Postmortem of take 4: the reset at ~17:59 UTC killed every queue and
# destroyed runs/ + artifacts/mask_cache/ again; the only surviving
# weights are the git-committed int8 npz of 02h28m05s epoch 16. This
# take rebuilds the whole cross-lineage release from zero:
#
#   0. re-hydrate the surviving npz lineage into runs/ (rematerialize_npz)
#   1. retrain 4 independent lineages of the pinned recipe — two plain
#      seeds + the class_weight_road=0.9 bias arm (VERDICT r3 task 7) +
#      a dropout-0.8 recipe-diverse arm (PARITY.md: cross-lineage
#      diversity is the live parity lever)
#   2. int8-vs-orbax end-to-end submission verify on a fresh lineage ->
#      decides the npz dtype for the release (>=0.999 agreement -> int8)
#   3. SWA + mask-cache populate for every completed lineage (odd late
#      epochs + SWA; consecutive epochs add search space, not diversity)
#   4. road-fraction instrument over the cache (bias-arm readout)
#   5. subset search -> release package with an npz for EVERY member
#   6. run.py --fuse / plain front-door verifies + parity records
#   7. size-guarded git commit of the npz release
#   8. fresh-clone npz-only verify (the exact fresh-user path)
#   9. hybrid_deconv benches (LAST: worth less than the durable release)
#
# All cutoffs are RELATIVE to launch (the take-4 absolute "today HH:MM"
# cutoffs went stale the moment the reset pushed the relaunch past noon).
set -u
cd /root/repo
START=$(date -u +%s)
now() { date -u +%s; }
CUT_TRAIN=$((START + 9900))    # stop starting new lineages after 2h45
CUT_POP=$((START + 14100))     # populate must wind down by 3h55
CUT_PLAIN=$((START + 16200))   # plain verify gate 4h30
CUT_VERIFY=$((START + 17100))  # fused verify / fresh clone gate 4h45
CUT_BENCH2=$((START + 18900))  # kernel benches gate 5h15
echo "take-5 launch $(date -u +%H:%M:%S); CUT_TRAIN=+165m CUT_POP=+235m CUT_VERIFY=+285m"
echo $$ > /tmp/r4e.pid

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

score_vs_winner() {  # $1 = output dir
  [ -f "$1/submission.csv" ] || return
  timeout 600 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys, json; sys.path.insert(0,'.')
from roadseg_tpu.utils.scoring import compare_submissions
r = compare_submissions('$1/submission.csv',
    '/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation'
    '_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/'
    'submission.csv')
print(json.dumps(r))
open('$1/parity_vs_winner.json','w').write(json.dumps(r, indent=2) + '\n')"
}

echo "=== 0. re-hydrate surviving npz lineage ($(date -u +%H:%M:%S))"
timeout 600 python scripts/rematerialize_npz.py \
  artifacts/release/2026-08-19T02h28m05s-epoch-016.chkpt.npz \
  >> artifacts/r4e.log 2>&1
echo "rematerialize exit=$?"

echo "=== 1. retrain cross-lineage seeds ($(date -u +%H:%M:%S))"
train_one() {  # $1 = seed, $2 = extra train args
  if [ "$(now)" -ge "$CUT_TRAIN" ]; then
    echo "skip seed $1 (past CUT_TRAIN)"; return
  fi
  WAIT_DEADLINE=60 TRAIN_LOG_PREFIX=train_r4e_seed TRAIN_EXTRA_ARGS="$2" \
    bash scripts/train_seeds_queue.sh "$1" >> artifacts/trainq_r4e.log 2>&1
  echo "seed $1 queue exit=$? $(date -u +%H:%M:%S)"
}
train_one 41 ""
train_one 42 ""
train_one 43 "--class_weight_road 0.9"
train_one 44 "--dropout 0.8"

# completed lineages = run dirs holding an epoch-029 checkpoint
LINEAGES=""
for d in $(ls -td runs/2026-* 2>/dev/null); do
  if ls -d "$d"/model-epoch-029.chkpt >/dev/null 2>&1; then
    LINEAGES="$LINEAGES $(basename "$d")"
  fi
done
echo "completed lineages:$LINEAGES"

echo "=== 2. int8-vs-orbax submission verify ($(date -u +%H:%M:%S))"
NEWEST=$(echo $LINEAGES | tr ' ' '\n' | sort | tail -1)
if [ -n "$NEWEST" ] && [ ! -f artifacts/npz_verify_int8_vs_orbax.json ]; then
  ORB="runs/$NEWEST/model-epoch-029.chkpt"
  NPZ="/tmp/int8_verify.npz"
  timeout 600 python -c "
import sys, os, jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, '.')
from roadseg_tpu.utils.checkpoint import Checkpointer, read_geometry, export_npz
from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
orb = os.path.abspath('$ORB')
geo = read_geometry(orb)
opts = Options(patch_size=388, num_epoch=0, save_path=os.path.abspath('runs'),
               logdir='runs/logs', **geo)
eng = Engine(opts)
eng.restore(file=orb)
state = jax.device_get({'step': eng.state['step'], 'params': eng.state['params']})
export_npz(state, '$NPZ', geometry=geo, dtype='int8')
print('exported $NPZ')" >> artifacts/npz_verify.log 2>&1
  for side in npz orbax; do
    src=$NPZ; [ "$side" = orbax ] && src=$ORB
    for attempt in 1 2 3; do
      until probe; do echo "tunnel down; sleep 120"; sleep 120; done
      timeout 1800 python scripts/make_submission.py --ckpt "$src" \
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
else echo "skip int8 verify (no lineage or already done)"; fi

echo "=== 3. SWA + populate every lineage ($(date -u +%H:%M:%S))"
MEMBERS="2026-08-19T02h28m05s:16"
for L in $LINEAGES; do
  if [ "$(now)" -ge "$CUT_POP" ]; then echo "ALARM: past CUT_POP"; break; fi
  timeout 900 python scripts/average_checkpoints.py --date "$L" \
    --epochs "24,25,26,27,28,29" --dilated 0 >> artifacts/swa_r4e.log 2>&1
  echo "SWA $L exit=$?"
  for e in $(ls -d "runs/$L"/model-epoch-*.chkpt 2>/dev/null \
             | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n); do
    if [ "$e" -eq 900 ] || { [ "$e" -ge 15 ] && [ $((e % 2)) -eq 1 ]; }; then
      MEMBERS="$MEMBERS $L:$e"
    fi
  done
done
echo "cache members: $MEMBERS"
bash scripts/populate_cache_members.sh artifacts/ensemble_r4e $MEMBERS
echo "populate exit=$?"

echo "=== 4. road-fraction instrument ($(date -u +%H:%M:%S))"
timeout 600 python scripts/road_fraction_by_member.py \
  >> artifacts/road_fraction.log 2>&1
echo "road_fraction exit=$?"

echo "=== 5. search -> release with npz for every member ($(date -u +%H:%M:%S))"
NPZ_DTYPE=$(python -c "
import json
try:
    r = json.load(open('artifacts/npz_verify_int8_vs_orbax.json'))
    print('int8' if r['int8_vs_orbax_patch_agreement'] >= 0.999 else 'float16')
except Exception:
    print('float16')")
echo "npz dtype: $NPZ_DTYPE"
timeout 3600 python scripts/finalize_parity.py --max_k 16 \
  --out artifacts/ensemble_r4_final --npz 99 --npz_dtype "$NPZ_DTYPE" \
  > artifacts/finalize_parity_r4.log 2>&1
echo "finalize exit=$?"; tail -3 artifacts/finalize_parity_r4.log

echo "=== 6. run.py front-door verifies ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_VERIFY" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 python run.py --fuse --out artifacts/run_verify_r4_fused \
    > artifacts/run_verify_r4_fused.log 2>&1
  echo "fused verify exit=$?"
  score_vs_winner artifacts/run_verify_r4_fused
  cat artifacts/run_verify_r4_fused/parity_vs_winner.json 2>/dev/null
  if [ "$(now)" -lt "$CUT_PLAIN" ]; then
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    timeout 1800 python run.py --out artifacts/run_verify_r4 \
      > artifacts/run_verify_r4.log 2>&1
    echo "plain verify exit=$?"
    score_vs_winner artifacts/run_verify_r4
    cat artifacts/run_verify_r4/parity_vs_winner.json 2>/dev/null
  fi
else echo "skip (past CUT_VERIFY)"; fi

echo "=== 7. commit the durable release (size-guarded) ($(date -u +%H:%M:%S))"
REL_BYTES=$(du -sb artifacts/release/ | cut -f1)
if [ "$REL_BYTES" -lt 2000000000 ]; then
  git add -f artifacts/release/release.json artifacts/release/fusion.json \
    artifacts/release/*.npz 2>/dev/null
  git add artifacts/ensemble_search.json artifacts/finalize_parity_r4.log \
    artifacts/ensemble_r4_final artifacts/run_verify_r4_fused \
    artifacts/run_verify_r4 artifacts/npz_verify_int8_vs_orbax.json \
    artifacts/road_fraction_by_member.json artifacts/r4e.log 2>/dev/null
  git commit -q -m "Round-4 release: cross-lineage ensemble with git-committed npz weights for every member

Packaged by scripts/r4_release_e.sh stage 5 (search over the rebuilt
round-4 mask cache after the third VM reset; finalize_parity.py
parsimonious-k pick). Weight payloads committed as npz so a fresh clone
reproduces the submission with no training and no external downloads
(the reference distributes weights by download+sha256, run.py:46-119;
git is this repo's only durable channel)." \
    && echo "release committed" || echo "release commit FAILED (or empty)"
else
  echo "SKIP commit: release dir ${REL_BYTES} bytes exceeds 2 GB guard"
fi

echo "=== 8. fresh-clone npz-only verify ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_VERIFY" ]; then
  rm -rf /tmp/freshclone
  git clone -q /root/repo /tmp/freshclone
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  (cd /tmp/freshclone && timeout 1800 python run.py --fuse \
     --out out_fused > run_fused.log 2>&1; echo "fresh-clone fuse exit=$?")
  mkdir -p artifacts/run_verify_r4_freshclone
  cp /tmp/freshclone/out_fused/submission.csv \
     artifacts/run_verify_r4_freshclone/ 2>/dev/null
  cp /tmp/freshclone/run_fused.log artifacts/run_verify_r4_freshclone/ 2>/dev/null
  score_vs_winner artifacts/run_verify_r4_freshclone
  cat artifacts/run_verify_r4_freshclone/parity_vs_winner.json 2>/dev/null
else echo "skip (past CUT_VERIFY)"; fi

echo "=== 9. hybrid_deconv benches ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_BENCH2" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_CONV_IMPL=hybrid_deconv timeout 1500 python bench.py \
    > artifacts/bench_r4_hybrid_deconv.json 2>&1
  echo "hybrid_deconv exit=$?"; tail -1 artifacts/bench_r4_hybrid_deconv.json
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1200 python scripts/bench_train.py --dilated 0 --batch 8 \
    --variants hybrid_deconv \
    > artifacts/bench_train_r4_hybrid_deconv.jsonl 2>&1
  echo "hybrid_deconv train exit=$?"
  grep -h '^{' artifacts/bench_train_r4_hybrid_deconv.jsonl
else echo "skip (past CUT_BENCH2)"; fi

echo "=== r4_release_e done ($(date -u +%H:%M:%S))"
