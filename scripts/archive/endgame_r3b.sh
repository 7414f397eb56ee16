#!/bin/bash
# Round-3b end-game: runs after the retrain queue (train_seeds_queue.sh)
# releases the chip. Rebuilds everything the VM reset destroyed (mask
# cache, release weights) and then executes the remaining measured
# deliverables, strictly one TPU process at a time. Parity first (north
# star #1), the dilated run + profiles + headline bench after.
set -u
cd /root/repo
QPID=$(cat /tmp/trainq.pid 2>/dev/null)
echo "waiting for train queue pid=$QPID..."
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "train queue done $(date -u +%H:%M:%S)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

# only runs that completed (epoch 29 saved) are ensemble lineages
RUNS=$(for d in runs/2026-08-18*; do
  [ -d "$d/model-epoch-029.chkpt" ] && basename "$d"; done)
echo "runs: $RUNS"

echo "=== 1. SWA members (CPU)"
for d in $RUNS; do
  [ -d "runs/$d/model-epoch-029.chkpt" ] || { echo "skip $d (no epoch 29)"; continue; }
  timeout 900 python scripts/average_checkpoints.py --date "$d" --dilated 0 \
    --epochs 24-29 --out_epoch 900 >> artifacts/swa_r3b.log 2>&1
  echo "swa $d exit=$?"
done

echo "=== 2. mask-cache populate (resilient loop)"
MEMBERS=""
for d in $RUNS; do MEMBERS="$MEMBERS --member $d:900"; done
for e in $(seq 29 -1 14); do
  for d in $RUNS; do MEMBERS="$MEMBERS --member $d:$e"; done
done
for cycle in $(seq 1 60); do
  have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
  echo "--- cycle $cycle: $have masks cached $(date -u +%H:%M:%S)"
  if ! probe; then echo "tunnel down; sleeping 60s"; sleep 60; continue; fi
  timeout 5400 python scripts/ensemble_runs.py $MEMBERS \
    --out artifacts/ensemble_r3b_all >> artifacts/mask_cache_populate_r3b.log 2>&1
  rc=$?
  echo "populate attempt exit=$rc"
  [ $rc -eq 0 ] && break
  sleep 30
done

echo "=== 3. finalize parity: search -> re-score -> release refresh"
timeout 1800 python scripts/finalize_parity.py --max_k 12 \
  > artifacts/finalize_parity_r3b.log 2>&1
echo "finalize exit=$?"
tail -2 artifacts/finalize_parity_r3b.log

echo "=== 4. run.py release verify (TPU predict, full submission)"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
timeout 3600 ./run.py --out artifacts/run_verify_r3_final \
  > artifacts/run_verify_r3_final.log 2>&1
echo "run.py exit=$?"
if [ -f artifacts/run_verify_r3_final/submission.csv ]; then
  timeout 600 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.path.insert(0,'.')
from roadseg_tpu.utils.scoring import compare_submissions
import json
r = compare_submissions('artifacts/run_verify_r3_final/submission.csv',
    '/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation'
    '_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/'
    'submission.csv')
print(json.dumps(r))
open('artifacts/run_verify_r3_final/parity_vs_winner.json','w').write(
    json.dumps(r, indent=2) + '\n')" >> artifacts/run_verify_r3_final.log 2>&1
  tail -1 artifacts/run_verify_r3_final.log
fi

echo "=== 5. dilated run (bench weights + ensemble diversity)"
for att in 1 2 3 4; do
  # completion check: any 2026-08-18 run with a DILATED epoch-029 checkpoint
  done_dir=$(for d in runs/2026-08-18*/model-epoch-029.chkpt; do
    grep -q '"dilated_layers": true' "$d/geometry.json" 2>/dev/null \
      && dirname "$d"; done | head -1)
  [ -n "$done_dir" ] && { echo "dilated run complete: $done_dir"; break; }
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 6000 python scripts/train_flagship.py --epochs 30 --batch 8 \
    --lr 0.08 --val 0 --no-remat --dilated 1 --seed 21 --save_from 20 \
    >> artifacts/train_r3b_dilated.log 2>&1
  echo "dilated train attempt $att exit=$?"
done

echo "=== 6. stage-wise train profile (batch 8, grad_accum 1 and 2)"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
timeout 1800 python scripts/profile_train.py --batch 8 --dilated 0 \
  --steps 10 --out artifacts/profile_train_r3.jsonl \
  > artifacts/profile_train_r3.log 2>&1
echo "profile ga1 exit=$?"
timeout 1800 python scripts/profile_train.py --batch 8 --grad_accum 2 \
  --dilated 0 --steps 10 --out artifacts/profile_train_r3.jsonl \
  >> artifacts/profile_train_r3.log 2>&1
echo "profile ga2 exit=$?"

echo "=== 7. grad-accum train bench rows (effective batch 16/32)"
timeout 2400 python scripts/bench_train.py --dilated 0 --batch 8 \
  --variants accum2,accum4 \
  > artifacts/bench_train_r3_accum.jsonl 2>&1
echo "bench_train exit=$?"

echo "=== 8. headline bench (dilated parity config, trained weights)"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
timeout 1800 python bench.py > artifacts/bench_r3_final.json 2>&1
echo "bench exit=$?"
tail -1 artifacts/bench_r3_final.json
echo "ENDGAME DONE $(date -u +%H:%M:%S)"
