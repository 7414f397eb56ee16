#!/bin/bash
# Round-5 perf stage (VERDICT round-4 task 5): runs once the release
# endgame has freed the chip (waits on /tmp/r5_endgame.done).
#   1  XLA scheduler/fusion flag sweep on the batch-8 train step
#   2  Pallas conv3x3 alignment-sensitivity arm (aligned w_out 384/192/...
#      vs the odd flagship sizes) — decides whether an aligned-tile
#      rewrite could close the forward gap before anyone writes one
# Results committed with explicit pathspecs.
set -u
cd /root/repo || exit 1
LOG=artifacts/r5_perf.log
exec >> "$LOG" 2>&1
echo "=== r5_perf start $(date -u +%H:%M:%S)"

DEADLINE=${DEADLINE:-21600}
waited=0
while [ ! -f /tmp/r5_endgame.done ]; do
  sleep 60; waited=$((waited + 60))
  [ $((waited % 1800)) -eq 0 ] && echo "still waiting on endgame (${waited}s)"
  if [ "$waited" -ge "$DEADLINE" ]; then
    echo "DEADLINE: endgame never finished; running perf stage anyway"
    break
  fi
done
echo "chip window open $(date -u +%H:%M:%S)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

# --- 1. XLA flag sweep ---------------------------------------------------
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
bash scripts/xla_flag_sweep.sh artifacts/xla_flag_sweep_r5.jsonl
echo "flag sweep exit=$?"

# --- 2. alignment-sensitivity arm ---------------------------------------
if [ ! -s artifacts/bench_kernels_r5_aligned.jsonl ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 python scripts/bench_kernels.py --ops conv3x3_aligned \
    --iters 20 2> artifacts/bench_kernels_r5_aligned.stderr.log \
    | grep '^{' > artifacts/bench_kernels_r5_aligned.jsonl
  echo "aligned bench exit=$?"
fi
# odd-size control re-measured in the SAME session for a fair A/B
if [ ! -s artifacts/bench_kernels_r5_odd.jsonl ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 python scripts/bench_kernels.py --ops conv3x3 \
    --iters 20 2> artifacts/bench_kernels_r5_odd.stderr.log \
    | grep '^{' > artifacts/bench_kernels_r5_odd.jsonl
  echo "odd control bench exit=$?"
fi

for f in artifacts/xla_flag_sweep_r5.jsonl \
         artifacts/bench_kernels_r5_aligned.jsonl \
         artifacts/bench_kernels_r5_odd.jsonl; do
  [ -s "$f" ] && git add -f -- "$f"
done
git commit -q -m "Round-5 perf measurements: XLA flag sweep + Pallas alignment-sensitivity A/B" \
  -- artifacts/xla_flag_sweep_r5.jsonl \
     artifacts/bench_kernels_r5_aligned.jsonl \
     artifacts/bench_kernels_r5_odd.jsonl \
  && echo "perf results committed" || echo "perf commit empty/failed"
touch /tmp/r5_perf.done
echo "=== r5_perf done $(date -u +%H:%M:%S)"
