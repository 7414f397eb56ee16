#!/bin/bash
# Sequenced TPU work queue for when the tunnel returns (round 3).
# Waits for the mask-cache populate loop to finish (it owns the chip),
# then runs the remaining measured deliverables one at a time — the
# tunnel serializes and concurrent clients can wedge it, so strictly
# one TPU process at a time, each bounded by timeout.
set -u
cd /root/repo
LOOP_PID=$(cat /tmp/maskcache.pid 2>/dev/null)
echo "waiting for populate loop pid=$LOOP_PID to exit..."
while [ -n "$LOOP_PID" ] && kill -0 "$LOOP_PID" 2>/dev/null; do sleep 60; done
have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
echo "populate loop exited; $have masks cached $(date -u +%H:%M:%S)"

echo "=== 1. finalize parity: search -> re-score -> release refresh (host)"
timeout 1200 python scripts/finalize_parity.py --max_k 12 \
  > artifacts/finalize_parity_r3.log 2>&1
echo "finalize exit=$?"

echo "=== 2. run.py release verify (TPU predict, full 50-image submission)"
timeout 3000 ./run.py --out artifacts/run_verify_r3_final \
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
fi

echo "=== 3. stage-wise train profile (batch 8, grad_accum 1 and 2)"
timeout 1800 python scripts/profile_train.py --batch 8 --dilated 0 \
  --steps 10 --out artifacts/profile_train_r3.jsonl \
  > artifacts/profile_train_r3.log 2>&1
echo "profile ga1 exit=$?"
timeout 1800 python scripts/profile_train.py --batch 8 --grad_accum 2 \
  --dilated 0 --steps 10 --out artifacts/profile_train_r3.jsonl \
  >> artifacts/profile_train_r3.log 2>&1
echo "profile ga2 exit=$?"

echo "=== 4. grad-accum train bench rows (effective batch 16/32)"
timeout 2400 python scripts/bench_train.py --dilated 0 --batch 8 \
  --variants accum2,accum4 \
  > artifacts/bench_train_r3_accum.jsonl 2>&1
echo "bench_train exit=$?"

echo "=== 5. headline bench (dilated parity config, geometry-matched restore)"
timeout 1800 python bench.py > artifacts/bench_r3_final.json 2>&1
echo "bench exit=$?"
tail -1 artifacts/bench_r3_final.json
echo "QUEUE DONE $(date -u +%H:%M:%S)"
