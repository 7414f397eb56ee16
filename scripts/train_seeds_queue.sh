#!/bin/bash
# Sequential retrain queue (round 3, post-VM-reset rebuild): waits for the
# in-flight run to release the chip, then trains the remaining independent
# seeds of the validated fast recipe back-to-back. One TPU process at a
# time — the tunnel serializes and concurrent clients can wedge it.
# After each run, its SWA (epoch-900) checkpoint is averaged on CPU so the
# populate pass can include it.
set -u
cd /root/repo
PREV_PID=$(cat /tmp/train.pid 2>/dev/null)
echo "waiting for in-flight training pid=$PREV_PID..."
while [ -n "$PREV_PID" ] && kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
echo "chip free $(date -u +%H:%M:%S)"

for seed in "$@"; do
  echo "=== training seed $seed $(date -u +%H:%M:%S)"
  timeout 3900 python scripts/train_flagship.py --epochs 30 --batch 8 \
    --lr 0.08 --val 0 --no-remat --dilated 0 --seed "$seed" --save_from 12 \
    > "artifacts/train_r3b_seed$seed.log" 2>&1
  echo "seed $seed exit=$?"
done

# SWA members: average late epochs 24-29 of every non-dilated run on CPU
for d in $(ls runs | grep 2026-08-18); do
  [ -d "runs/$d" ] || continue
  ls runs/$d/model-epoch-029.chkpt >/dev/null 2>&1 || continue
  timeout 900 python scripts/average_checkpoints.py --date "$d" \
    --epochs 24-29 --out_epoch 900 >> artifacts/swa_r3b.log 2>&1
  echo "swa $d exit=$?"
done
echo "TRAIN QUEUE DONE $(date -u +%H:%M:%S)"
