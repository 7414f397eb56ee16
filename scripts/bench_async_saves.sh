#!/bin/bash
# A/B the overlapped checkpoint save (Engine.save(blocking=False)) on the
# real chip: two identical 4-epoch flagship runs saving EVERY epoch
# (--save_from 0), sync vs async. The measured boundary is 40-70 s per
# save (device_get over the tunnel + Orbax + SHA; docs/SCALING.md), so
# the async arm should win ~3 boundaries of wall time (the final epoch
# always saves blocking).
#
# Usage: bash scripts/bench_async_saves.sh   (chip must be free)
set -u
cd /root/repo
OUT=artifacts/bench_async_saves.jsonl
: > "$OUT"
for mode in 0 1; do
  t0=$(date -u +%s)
  timeout 1200 python scripts/train_flagship.py \
    --epochs 4 --batch 8 --lr 0.08 --val 0 --no-remat --dilated 0 \
    --seed 7 --save_from 0 --async_saves "$mode" \
    > "artifacts/bench_async_saves_$mode.log" 2>&1
  rc=$?
  wall=$(( $(date -u +%s) - t0 ))
  # sum of pure train seconds, for the boundary split
  train_s=$(grep -h '"train_s"' "artifacts/bench_async_saves_$mode.log" \
    | python -c "import sys,json;print(round(sum(json.loads(l)['train_s'] for l in sys.stdin),1))")
  echo "{\"async_saves\": $mode, \"epochs\": 4, \"wall_s\": $wall, \"train_s\": $train_s, \"exit\": $rc}" | tee -a "$OUT"
  # drop the throwaway run dirs so they never enter release/populate scans
  for d in $(grep -h "run dir\|Model saved in file" \
      "artifacts/bench_async_saves_$mode.log" \
      | grep -o "runs/[^/']*" | sort -u); do
    rm -rf "/root/repo/$d"
  done
  sleep 10
done
echo "done: $(cat $OUT)"
