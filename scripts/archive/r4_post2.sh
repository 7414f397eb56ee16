#!/bin/bash
# Second post-pipeline queue: perf measurements that want an otherwise
# idle chip. Runs after r4_post.sh (pid file /tmp/r4post.pid) exits.
#  1. async-saves A/B (scripts/bench_async_saves.sh) — measures how much
#     of the 40-70 s epoch boundary Engine.save(blocking=False) hides.
#  2. headline-bench chunk sweep — BENCH_PRED_BATCH x BENCH_CHUNK around
#     the current 3.22 img/s operating point (2x36).
# Every step is existence-guarded and wall-clock bounded.
set -u
cd /root/repo
echo $$ > /tmp/r4post2.pid
for i in $(seq 1 420); do
  [ -f /tmp/r4post.done ] && break
  sleep 60
done
[ -f /tmp/r4post.done ] || { echo "r4_post not done after 7h; abort"; exit 1; }
echo "r4_post done; starting perf queue ($(date -u +%H:%M:%S))"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

if [ ! -s artifacts/bench_async_saves.jsonl ]; then
  echo "--- async saves A/B"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 3000 bash scripts/bench_async_saves.sh \
    > artifacts/bench_async_saves.log 2>&1
  echo "async A/B exit=$?"
  cat artifacts/bench_async_saves.jsonl 2>/dev/null
fi

if [ ! -s artifacts/bench_r4_chunk_sweep.jsonl ]; then
  echo "--- headline chunk sweep"
  : > artifacts/bench_r4_chunk_sweep.jsonl
  for combo in "2 36" "4 36" "2 18" "4 27" "5 45"; do
    set -- $combo
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    line=$(BENCH_PRED_BATCH=$1 BENCH_CHUNK=$2 BENCH_IMAGES=20 \
           timeout 900 python bench.py 2>/dev/null | grep '^{' | tail -1)
    echo "{\"pred_batch\": $1, \"chunk\": $2, \"result\": ${line:-null}}" \
      >> artifacts/bench_r4_chunk_sweep.jsonl
    echo "pred_batch=$1 chunk=$2 -> $line"
  done
fi

git add artifacts/bench_async_saves.jsonl artifacts/bench_async_saves.log \
  artifacts/bench_r4_chunk_sweep.jsonl 2>/dev/null
git commit -q -m "Measure async-save overlap and headline chunk sweep on-chip

No-Verification-Needed: artifact-only commit (measurement JSONs/logs; no source change)" \
  && echo "perf artifacts committed" || echo "perf commit empty/failed"
echo "=== r4_post2 done ($(date -u +%H:%M:%S))"
