#!/bin/bash
# Full-image predict mode measurements (runs after parity_r3c.sh frees
# the chip):
#   1. headline-bench throughput in full-image mode (same dilated bench
#      config as BENCH_r0x, BENCH_FULL_IMAGE=1),
#   2. quality: the released ensemble's members re-predicted in
#      full-image mode and scored vs the winner submission — the
#      measured cost of dropping the stride-110 overlap averaging.
set -u
cd /root/repo
WAIT_PID=$(cat "${1:-/tmp/parity_r3c.pid}" 2>/dev/null)
echo "waiting for pid=$WAIT_PID..."
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "chip free $(date -u +%H:%M:%S)"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

echo "=== 1. full-image headline bench (dilated bench config)"
until probe; do echo "tunnel down; sleep 120"; sleep 120; done
BENCH_FULL_IMAGE=1 timeout 1800 python bench.py \
  > artifacts/bench_r3_fullimage.json 2>&1
echo "bench exit=$?"
tail -1 artifacts/bench_r3_fullimage.json

echo "=== 2. full-image ensemble quality (released member set)"
MEMBERS=$(python - <<'EOF'
import json
try:
    best = max(json.load(open("artifacts/ensemble_search.json"))
               ["best_by_k"].values(), key=lambda v: v["agreement"])
    # cache names are DATE_epochNNN -> DATE:EPOCH member specs
    print(" ".join("--member " + n.rsplit("_epoch", 1)[0] + ":"
                   + str(int(n.rsplit("_epoch", 1)[1]))
                   for n in best["members"]))
except Exception as e:
    print()
EOF
)
echo "members: $MEMBERS"
if [ -n "$MEMBERS" ]; then
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 5400 python scripts/ensemble_runs.py $MEMBERS --full_image 1 \
    --out artifacts/ensemble_fullimage \
    > artifacts/ensemble_fullimage.log 2>&1
  echo "ensemble exit=$?"
  tail -2 artifacts/ensemble_fullimage.log
fi
echo "FULLIMAGE R3 DONE $(date -u +%H:%M:%S)"
