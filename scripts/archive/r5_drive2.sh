#!/bin/bash
# Round-5 drive, take 2 (post-reset): runs/ and mask cache were wiped by
# another VM reset; seed-52's sentinel is gone so it restarts fresh.
#   1. seeds 52, 53: fresh independent non-dilated lineages
#   2. seed 61: dilated (Mango) lineage — VERDICT round-4 task 6
#   3. rehydrate committed anchors into runs/ (scripts/r5_rehydrate.sh)
#   4. scripts/r5_endgame.sh
#   5. scripts/r5_perf.sh
set -u
cd /root/repo || exit 1
LOG=artifacts/r5_drive2.log
exec >> "$LOG" 2>&1
echo "=== r5_drive2 start $(date -u +%H:%M:%S)"

TRAIN_LOG_PREFIX=train_r5_seed TRAIN_EXTRA_ARGS="--async_saves 1" \
  bash scripts/train_seeds_queue.sh 52 53
echo "=== non-dilated queue done $(date -u +%H:%M:%S)"

TRAIN_LOG_PREFIX=train_r5_dil TRAIN_EXTRA_ARGS="--async_saves 1 --dilated 1" \
  bash scripts/train_seeds_queue.sh 61
echo "=== dilated queue done $(date -u +%H:%M:%S)"

[ -x scripts/r5_rehydrate.sh ] && bash scripts/r5_rehydrate.sh
bash scripts/r5_endgame.sh
echo "=== r5_endgame rc=$? $(date -u +%H:%M:%S)"
bash scripts/r5_perf.sh
echo "=== r5_drive2 done $(date -u +%H:%M:%S)"
