#!/bin/bash
# Round-6 perf window (VERDICT r5 task 5, two rounds old): waits for the
# r6 chipline to free the chip, then runs
#   1  hybrid_deconv predict bench on the shipped release weights
#      (its only prior artifact was a round-4 crash)
#   2  scripts/r5_perf.sh: XLA flag sweep + conv3x3 alignment A/B
# Stage-markered and idempotent, like r6_chipline.sh.
set -u
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
MARK=artifacts/r6_markers
mkdir -p "$MARK"
LOG=artifacts/r6_perf.log
exec >> "$LOG" 2>&1
echo "=== r6_perf_queue start $(date -u +%H:%M:%S)"

waited=0
while [ ! -e "$MARK/chipline_done" ] && [ $waited -lt 5400 ]; do
  sleep 30; waited=$((waited + 30))
done
echo "chip window open $(date -u +%H:%M:%S) (waited ${waited}s)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

# --- P1: hybrid_deconv predict bench ------------------------------------
if [ ! -e "$MARK/p1_hybrid_deconv" ]; then
  echo "=== P1 hybrid_deconv bench ($(date -u +%H:%M:%S))"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  BENCH_CONV_IMPL=hybrid_deconv timeout 1500 python bench.py \
    > /tmp/bench_hd.out 2> /tmp/bench_hd.err
  rc=$?
  echo "hybrid_deconv bench exit=$rc"; tail -1 /tmp/bench_hd.out
  if [ $rc -eq 0 ] && tail -1 /tmp/bench_hd.out | grep -q '^{'; then
    tail -1 /tmp/bench_hd.out > artifacts/bench_r6_hybrid_deconv.json
    touch "$MARK/p1_hybrid_deconv"
    git add -f artifacts/bench_r6_hybrid_deconv.json
    git commit -q -m "Measure hybrid_deconv predict on shipped release weights" \
      -- artifacts/bench_r6_hybrid_deconv.json && echo committed
  else
    tail -3 /tmp/bench_hd.err
  fi
fi

# --- P2: flag sweep + alignment A/B (r5_perf.sh, sentinel satisfied) ----
if [ ! -e "$MARK/p2_r5_perf" ]; then
  echo "=== P2 r5_perf ($(date -u +%H:%M:%S))"
  touch /tmp/r5_endgame.done
  bash scripts/r5_perf.sh && touch "$MARK/p2_r5_perf"
  echo "r5_perf exit=$?"
fi

echo "=== r6_perf_queue done ($(date -u +%H:%M:%S))"
touch "$MARK/perf_done"
