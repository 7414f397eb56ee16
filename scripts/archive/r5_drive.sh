#!/bin/bash
# Round-5 master driver (resumed session): finish the training queue the
# tunnel outage killed, then hand off to the endgame pipeline.
#   1. seed 52: resume the interrupted lineage (sentinel in 08h34m27s)
#   2. seed 53: fresh independent non-dilated lineage (pool diversity)
#   3. seed 61: dilated (Mango) lineage — VERDICT round-4 task 6
#   4. scripts/r5_endgame.sh (repair -> anchors -> populate -> finalize
#      -> fusion -> fresh-clone verifies -> gated commits -> benches -> docs)
set -u
cd /root/repo || exit 1
LOG=artifacts/r5_drive.log
exec >> "$LOG" 2>&1
echo "=== r5_drive start $(date -u +%H:%M:%S)"

TRAIN_LOG_PREFIX=train_r5_seed TRAIN_EXTRA_ARGS="--async_saves 1" \
  bash scripts/train_seeds_queue.sh \
    52:2026-08-20T08h34m27s 53
echo "=== non-dilated queue done $(date -u +%H:%M:%S)"

TRAIN_LOG_PREFIX=train_r5_dil TRAIN_EXTRA_ARGS="--async_saves 1 --dilated 1" \
  bash scripts/train_seeds_queue.sh 61
echo "=== dilated queue done $(date -u +%H:%M:%S)"

bash scripts/r5_endgame.sh
echo "=== r5_drive done $(date -u +%H:%M:%S)"
