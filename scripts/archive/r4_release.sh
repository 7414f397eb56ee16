#!/bin/bash
# Round-4 release rebuild queue (runs after scripts/r4_endgame.sh).
#
#   1. seed-14b lineage with class_weight_road=0.9 — the road-fraction-
#      bias treatment arm (VERDICT r3 task 7) that doubles as a recipe-
#      diverse ensemble member (PARITY.md: cross-lineage diversity is the
#      live parity lever)
#   2. SWA member + mask-cache populate for that lineage
#   3. cross-lineage subset search -> release package with an npz weight
#      file for EVERY member (VERDICT r3 task 1: two VM resets destroyed
#      every gitignored Orbax payload; git-committed npz is the only
#      durable channel). npz dtype = int8 if the endgame's end-to-end
#      int8-vs-orbax verify (stage 4) shows >=0.999 patch agreement,
#      else float16.
#   4. ./run.py --fuse and ./run.py front-door verifies + parity records
#   5. size-guarded git commit of the npz release
#   6. fresh-clone npz-only verify (the exact fresh-user path)
#   7. hybrid_deconv predict/train benches (VERDICT r3 task 6) — LAST:
#      kernel rows are worth less than the durable-release proof if the
#      round runs short
#
# Every wait is deadline-guarded with alarm lines; every stage has a
# wall-clock cutoff so a wedged stage can't silently eat the round
# (round-3 postmortem).
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/endgame_outer.pid}" 2>/dev/null)
WAIT_DEADLINE=${WAIT_DEADLINE:-18000}
echo "waiting for endgame pid=$WAIT_PID (deadline ${WAIT_DEADLINE}s)..."
waited=0
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 60; waited=$((waited + 60))
  [ $((waited % 600)) -eq 0 ] && echo "still waiting on pid=$WAIT_PID after ${waited}s $(date -u +%H:%M:%S)"
  if [ "$waited" -ge "$WAIT_DEADLINE" ]; then
    echo "ALARM: wait deadline exceeded; proceeding anyway $(date -u +%H:%M:%S)"
    break
  fi
done
echo "endgame done, chip free $(date -u +%H:%M:%S)"
echo $$ > /tmp/r4_release.pid

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}
now() { date -u +%s; }
CUT_TRAIN=${CUT_TRAIN:-$(date -u -d "today 12:10" +%s)}
CUT_VERIFY=${CUT_VERIFY:-$(date -u -d "today 13:42" +%s)}
# the plain (non-fused) verify is the least valuable stage-4 item — it
# must not squeeze the commit + fresh-clone proof behind it
CUT_PLAIN=${CUT_PLAIN:-$(date -u -d "today 13:05" +%s)}
CUT_BENCH2=${CUT_BENCH2:-$(date -u -d "today 13:50" +%s)}

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

echo "=== 1. seed-14b class_weight_road=0.9 lineage ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_TRAIN" ] && [ ! -f /tmp/r4_seed14.done ]; then
  WAIT_DEADLINE=600 TRAIN_LOG_PREFIX=train_r4_seed \
    TRAIN_EXTRA_ARGS="--class_weight_road 0.9" \
    bash scripts/train_seeds_queue.sh 14 >> artifacts/trainq_r4c.log 2>&1
  echo "seed-14b queue exit=$?"; touch /tmp/r4_seed14.done
else echo "skip (past cutoff or done)"; fi

# the lineage dir seed 14b trained into = newest run dir that actually
# finished (has an epoch>=25 checkpoint) — crashed retry attempts leave
# newer-but-empty dirs behind
S14=""
for d in $(ls -td runs/2026-* 2>/dev/null); do
  if ls -d "$d"/model-epoch-02[5-9].chkpt >/dev/null 2>&1; then
    S14=$(basename "$d"); break
  fi
done
echo "seed-14b lineage: $S14"

echo "=== 2. SWA + populate for $S14 ($(date -u +%H:%M:%S))"
# -d: the .chkpt entries are Orbax DIRECTORIES; plain ls lists their
# contents with ":"-suffixed headers and breaks the integer guards
last=$(ls -d "runs/$S14"/model-epoch-0*.chkpt 2>/dev/null \
       | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | awk '$1 < 900' \
       | sort -n | tail -1)
if [ -n "$last" ] && [ "$last" -ge 25 ]; then
  timeout 900 python scripts/average_checkpoints.py --date "$S14" \
    --epochs "24,25,26,27,28,29" --dilated 0 >> artifacts/swa_r4.log 2>&1
  echo "SWA $S14 exit=$?"
  MEMBERS=""
  # odd late epochs + SWA only: halves the populate wall; consecutive
  # epochs agree 0.975-0.985 with each other (PARITY.md round 3) so the
  # even epochs add search space, not diversity
  for e in $(ls -d "runs/$S14"/model-epoch-*.chkpt 2>/dev/null \
             | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n); do
    if [ "$e" -eq 900 ] || { [ "$e" -ge 15 ] && [ $((e % 2)) -eq 1 ]; }; then
      MEMBERS="$MEMBERS $S14:$e"
    fi
  done
  bash scripts/populate_cache_members.sh artifacts/ensemble_r4b $MEMBERS
  echo "populate exit=$?"
else echo "skip ($S14 last epoch ${last:-none})"; fi

echo "=== 3. search -> release package with npz for every member ($(date -u +%H:%M:%S))"
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

echo "=== 4. run.py front-door verifies ($(date -u +%H:%M:%S))"
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
else echo "skip (past cutoff)"; fi

echo "=== 5. commit the durable release (size-guarded) ($(date -u +%H:%M:%S))"
# VERDICT r3 task 1: npz weights for EVERY member must live in git —
# two VM resets already destroyed every gitignored Orbax payload.
REL_BYTES=$(du -sb artifacts/release/ | cut -f1)
if [ "$REL_BYTES" -lt 2000000000 ]; then
  git add -f artifacts/release/release.json artifacts/release/fusion.json \
    artifacts/release/*.npz 2>/dev/null
  git add artifacts/ensemble_search.json artifacts/finalize_parity_r4.log \
    artifacts/ensemble_r4_final artifacts/run_verify_r4_fused \
    artifacts/run_verify_r4 2>/dev/null
  git commit -q -m "Round-4 release: cross-lineage ensemble with git-committed npz weights for every member

Packaged by scripts/r4_release.sh stage 3 (search over the round-4 mask
cache; scripts/finalize_parity.py parsimonious-k pick). Weight payloads
committed as npz so a fresh clone reproduces the submission with no
training and no external downloads (the reference distributes weights by
download+sha256, run.py:46-119; git is this repo's only channel)." \
    && echo "release committed" || echo "release commit FAILED (or empty)"
else
  echo "SKIP commit: release dir ${REL_BYTES} bytes exceeds 2 GB guard"
fi

echo "=== 6. fresh-clone npz-only verify ($(date -u +%H:%M:%S))"
# A clone gets ONLY the committed npz (Orbax payloads are gitignored):
# this is the exact fresh-user path (ADVICE r3 medium item).
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
else echo "skip (past cutoff)"; fi

echo "=== 7. hybrid_deconv predict/train benches ($(date -u +%H:%M:%S))"
# Measures whether isolating the one per-shape Pallas win (fused
# deconv2x2+concat) beats xla end-to-end (VERDICT r3 task 6's bar).
if [ "$(now)" -lt "$CUT_BENCH2" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_CONV_IMPL=hybrid_deconv timeout 1500 python bench.py \
    > artifacts/bench_r4_hybrid_deconv.json 2>&1
  echo "hybrid_deconv exit=$?"; tail -1 artifacts/bench_r4_hybrid_deconv.json
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_FULL_IMAGE=1 BENCH_CONV_IMPL=hybrid_deconv timeout 1500 \
    python bench.py > artifacts/bench_r4_fullimage_hybrid_deconv.json 2>&1
  echo "fullimage+hybrid_deconv exit=$?"
  tail -1 artifacts/bench_r4_fullimage_hybrid_deconv.json
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1200 python scripts/bench_train.py --dilated 0 --batch 8 \
    --variants hybrid_deconv \
    > artifacts/bench_train_r4_hybrid_deconv.jsonl 2>&1
  echo "hybrid_deconv train exit=$?"
  grep -h '^{' artifacts/bench_train_r4_hybrid_deconv.jsonl
else echo "skip (past cutoff)"; fi

echo "=== r4_release done ($(date -u +%H:%M:%S))"
