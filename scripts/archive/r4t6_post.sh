#!/bin/bash
# Post-take-6 perf queue: measurements that want an otherwise idle chip,
# run only after the release pipeline (scripts/r4_take6.sh) touches
# /tmp/r4t6.done. Every step is existence-guarded and wall-clock
# bounded; artifacts are committed at the end.
#  1. hybrid_deconv predict + train benches (DESIGN.md's experimental
#     Pallas bar: the fused deconv2x2+crop-concat backend must beat xla
#     end-to-end or the library stays opt-in).
#  2. async-saves A/B (scripts/bench_async_saves.sh) — how much of the
#     40-70 s tunnel epoch boundary Engine.save(blocking=False) hides.
set -u
cd /root/repo
echo $$ > /tmp/r4t6post.pid
for i in $(seq 1 420); do
  [ -f /tmp/r4t6.done ] && break
  sleep 60
done
[ -f /tmp/r4t6.done ] || { echo "r4_take6 not done after 7h; abort"; exit 1; }
echo "pipeline done; perf queue starts ($(date -u +%H:%M:%S))"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

if [ ! -s artifacts/bench_r4_hybrid_deconv.json ]; then
  echo "--- hybrid_deconv predict bench"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_CONV_IMPL=hybrid_deconv timeout 1500 python bench.py \
    > artifacts/bench_r4_hybrid_deconv.json 2>&1
  echo "hybrid_deconv exit=$?"; tail -1 artifacts/bench_r4_hybrid_deconv.json
fi

if [ ! -s artifacts/bench_train_r4_hybrid_deconv.jsonl ]; then
  echo "--- hybrid_deconv train bench"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1200 python scripts/bench_train.py --dilated 0 --batch 8 \
    --variants hybrid_deconv \
    > artifacts/bench_train_r4_hybrid_deconv.jsonl 2>&1
  echo "hybrid_deconv train exit=$?"
  grep -h '^{' artifacts/bench_train_r4_hybrid_deconv.jsonl
fi

if [ ! -s artifacts/bench_async_saves.jsonl ]; then
  echo "--- async saves A/B"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 3000 bash scripts/bench_async_saves.sh \
    > artifacts/bench_async_saves.log 2>&1
  echo "async A/B exit=$?"
  cat artifacts/bench_async_saves.jsonl 2>/dev/null
fi

git add artifacts/bench_r4_hybrid_deconv.json \
  artifacts/bench_train_r4_hybrid_deconv.jsonl \
  artifacts/bench_async_saves.jsonl artifacts/bench_async_saves.log 2>/dev/null
for i in 1 2 3; do
  git commit -q -m "Round-4 perf measurements: hybrid_deconv benches + async-save A/B

No-Verification-Needed: artifact-only commit (measurement JSONs/logs)" \
    && { echo "perf artifacts committed"; break; } || sleep 7
done
echo "=== r4t6_post done ($(date -u +%H:%M:%S))"
