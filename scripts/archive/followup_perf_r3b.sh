#!/bin/bash
# Post-endgame perf experiments (round 3b), one TPU process at a time:
#   1. pad8 conv backend vs xla on the non-dilated train step
#   2. XLA latency-hiding scheduler flag A/B on the same step
#   3. pad8 inference throughput (headline program)
# Launch manually once endgame_r3b.sh is done (or pass a pid file to wait on).
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/endgame.pid}" 2>/dev/null)
echo "waiting for pid=$WAIT_PID..."
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "chip free $(date -u +%H:%M:%S)"

echo "=== pad8 vs xla train step (non-dilated, batch 8)"
timeout 2400 python scripts/bench_train.py --dilated 0 --batch 8 \
  --variants noremat,pad8 > artifacts/bench_train_r3_pad8.jsonl 2>&1
echo "pad8 bench exit=$?"
tail -2 artifacts/bench_train_r3_pad8.jsonl

echo "=== latency-hiding scheduler A/B (noremat step)"
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
timeout 2400 python scripts/bench_train.py --dilated 0 --batch 8 \
  --variants noremat > artifacts/bench_train_r3_lhs.jsonl 2>&1
echo "lhs bench exit=$?"
tail -1 artifacts/bench_train_r3_lhs.jsonl

echo "=== pad8 inference headline"
BENCH_CONV_IMPL=pad8 timeout 1800 python bench.py \
  > artifacts/bench_r3_pad8.json 2>&1
echo "pad8 inference exit=$?"
tail -1 artifacts/bench_r3_pad8.json
echo "FOLLOWUP DONE $(date -u +%H:%M:%S)"
