#!/bin/bash
# Round-3 final TPU stage. Runs after parity_r3c.sh frees the chip and
# packs the remaining round time in strict priority order, each stage
# gated on a wall-clock cutoff (UTC) so a tunnel outage degrades
# gracefully instead of leaving the release unrefreshed:
#   1. seed-5 training        — a 5th independent non-dilated lineage
#      (PARITY.md: member diversity is the only live parity lever)
#   2. pad8 train + inference benches (the round's unmeasured backend)
#   3. full-image headline bench (BENCH_FULL_IMAGE=1)
#   4. populate seed-5 late epochs into the mask cache
#   5. full-image member predicts (extra `_full` cache diversity)
#   6. final finalize_parity  — search -> oracle re-score -> release
#   7. run.py end-to-end release verify
#   8. cross-generation label-fuse artifact (host-side)
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/parity_r3c.pid}" 2>/dev/null)
echo "waiting for pid=$WAIT_PID..."
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "chip free $(date -u +%H:%M:%S)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}
now() { date -u +%s; }
CUT_TRAIN=$(date -u -d "today 16:20" +%s)
CUT_POP=$(date -u -d "today 17:30" +%s)
CUT_VERIFY=$(date -u -d "today 17:52" +%s)

echo "=== 1. seed-5 lineage (recipe-diverse: dropout 0.8) ($(date -u +%H:%M:%S))"
# ceiling_estimate.py shows same-recipe members are variance-saturated
# (k-curve peaks at 5); a differently-regularized lineage decorrelates
# errors — and doubles as the round-1 dropout-0.8 A/B (VERDICT task 7).
if [ "$(now)" -lt "$CUT_TRAIN" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 2400 python scripts/train_flagship.py --epochs 30 --batch 8 \
    --lr 0.08 --val 0 --no-remat --dilated 0 --seed 5 --save_from 14 \
    --dropout 0.8 \
    > artifacts/train_r3_seed5.log 2>&1
  echo "seed5 exit=$?"
  SEED5=$(ls -td runs/2026-08-18T1[4-9]* 2>/dev/null | head -1 | xargs -r basename)
else
  echo "skip (past cutoff)"
  SEED5=""
fi
echo "seed5 run: '$SEED5'"

echo "=== 2. pad8 benches ($(date -u +%H:%M:%S))"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
timeout 1800 python scripts/bench_train.py --dilated 0 --batch 8 \
  --variants pad8 > artifacts/bench_train_r3_pad8.jsonl 2>&1
echo "pad8 train exit=$?"; grep -h '^{' artifacts/bench_train_r3_pad8.jsonl
BENCH_CONV_IMPL=pad8 timeout 1500 python bench.py \
  > artifacts/bench_r3_pad8.json 2>&1
echo "pad8 inference exit=$?"; tail -1 artifacts/bench_r3_pad8.json

echo "=== 3. full-image headline bench ($(date -u +%H:%M:%S))"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
BENCH_FULL_IMAGE=1 timeout 1500 python bench.py \
  > artifacts/bench_r3_fullimage.json 2>&1
echo "fullimage bench exit=$?"; tail -1 artifacts/bench_r3_fullimage.json

echo "=== 4. populate seed-5 members ($(date -u +%H:%M:%S))"
if [ -n "$SEED5" ] && [ -d "runs/$SEED5/model-epoch-029.chkpt" ]; then
  MEMBERS=""
  for e in 014 016 018 020 022 024 026 028; do
    [ "$(now)" -lt "$CUT_POP" ] || break
    MEMBERS="$MEMBERS $SEED5:$((10#$e))"
  done
  [ -n "$MEMBERS" ] && for cycle in 1 2 3; do
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    bash scripts/populate_cache_members.sh artifacts/ensemble_seed5 $MEMBERS \
      >> artifacts/populate_seed5.log 2>&1 && break
    echo "populate attempt $cycle failed"; sleep 60
  done
else
  echo "skip (no completed seed-5 run)"
fi

echo "=== 5. full-image member diversity ($(date -u +%H:%M:%S))"
if [ "$(now)" -lt "$CUT_POP" ]; then
  MEMBERS=$(python - <<'EOF'
import json
try:
    best = max(json.load(open("artifacts/ensemble_search.json"))
               ["best_by_k"].values(), key=lambda v: v["agreement"])
    print(" ".join("--member " + n.rsplit("_epoch", 1)[0] + ":"
                   + str(int(n.rsplit("_epoch", 1)[1]))
                   for n in best["members"] if not n.endswith("_full")))
except Exception:
    print()
EOF
)
  echo "members: $MEMBERS"
  if [ -n "$MEMBERS" ]; then
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    timeout 2400 python scripts/ensemble_runs.py $MEMBERS --full_image 1 \
      --out artifacts/ensemble_fullimage \
      > artifacts/ensemble_fullimage.log 2>&1
    echo "fullimage ensemble exit=$?"; tail -2 artifacts/ensemble_fullimage.log
  fi
else
  echo "skip (past cutoff)"
fi

echo "=== 6. final search -> release refresh ($(date -u +%H:%M:%S))"
timeout 2400 python scripts/finalize_parity.py --max_k 16 \
  > artifacts/finalize_parity_r3_final.log 2>&1
echo "finalize exit=$?"; tail -2 artifacts/finalize_parity_r3_final.log

echo "=== 7. run.py release verify ($(date -u +%H:%M:%S))"
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
if [ "$(now)" -lt "$CUT_VERIFY" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1200 python run.py --fuse --out artifacts/run_verify_r3_fused \
    > artifacts/run_verify_r3_fused.log 2>&1
  echo "fused verify exit=$?"
  score_vs_winner artifacts/run_verify_r3_fused
  if [ "$(now)" -lt "$CUT_VERIFY" ]; then
    timeout 1200 python run.py --out artifacts/run_verify_r3_end \
      > artifacts/run_verify_r3_end.log 2>&1
    echo "verify exit=$?"
    score_vs_winner artifacts/run_verify_r3_end
  fi
else
  echo "skip (past cutoff; oracle re-score in stage 6 already validated)"
fi

echo "=== 8a. search incl. full-image members (artifact record, host)"
timeout 1200 python scripts/ensemble_search.py --max_k 16 \
  --out artifacts/ensemble_search_with_full.json \
  > artifacts/ensemble_search_with_full.log 2>&1
echo "with-full search exit=$?"
python -c "
import json
d = json.load(open('artifacts/ensemble_search_with_full.json'))
print(json.dumps(d['best'], indent=1)[:400])" 2>/dev/null

echo "=== 8. cross-generation label fusion artifact ($(date -u +%H:%M:%S))"
for w in 2 3 4; do
  timeout 900 python scripts/label_fuse.py \
    --csv "artifacts/ensemble_final_old_r3.csv:$w" --members auto \
    --out "artifacts/label_fuse_final_w$w.json" \
    --write_csv "artifacts/label_fuse_final_w$w.csv" \
    >> artifacts/label_fuse_final.log 2>&1
  echo "fuse w=$w exit=$? $(python -c "
import json; print(json.load(open('artifacts/label_fuse_final_w$w.json'))['selected']['agreement'])" 2>/dev/null)"
done
# + the two surviving single-run lineage CSVs as extra old-generation votes
timeout 900 python scripts/label_fuse.py \
  --csv artifacts/ensemble_final_old_r3.csv:3 \
  --csv artifacts/submission_r1_final/submission.csv:1 \
  --csv artifacts/submission_r1b/submission.csv:1 \
  --members auto \
  --out artifacts/label_fuse_final_5gen.json \
  --write_csv artifacts/label_fuse_final_5gen.csv \
  >> artifacts/label_fuse_final.log 2>&1
echo "fuse 5gen exit=$? $(python -c "
import json; print(json.load(open('artifacts/label_fuse_final_5gen.json'))['selected']['agreement'])" 2>/dev/null)"
echo "R3 FINAL DONE $(date -u +%H:%M:%S)"
