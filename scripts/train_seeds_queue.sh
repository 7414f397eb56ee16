#!/bin/bash
# Resilient sequential retrain queue (round 3b): trains independent seeds
# of the validated fast non-dilated recipe, one TPU process at a time,
# surviving tunnel outages/wedges:
#   * probe the tunnel with a cheap bounded op before every attempt;
#   * each attempt bounded by timeout; on failure, resume the partial run
#     (sentinel/newest checkpoint) at the next uncompleted epoch instead
#     of retraining from scratch;
#   * a seed is done when its run dir holds model-epoch-029.chkpt.
#
# Usage: train_seeds_queue.sh SEED[:RESUME_DIR] ...
set -u
cd /root/repo
LOG_PREFIX=${TRAIN_LOG_PREFIX:-train_r4_seed}
# Deadline-guarded wait (round-3 postmortem: two queues died silently at
# "waiting for pid" — a stuck wait must alarm and eventually give up, not
# eat the round with zero output).
WAIT_DEADLINE=${WAIT_DEADLINE:-7200}
PREV_PID=$(cat /tmp/train.pid 2>/dev/null)
echo "waiting for in-flight training pid=$PREV_PID (deadline ${WAIT_DEADLINE}s)..."
waited=0
while [ -n "$PREV_PID" ] && kill -0 "$PREV_PID" 2>/dev/null; do
  sleep 30; waited=$((waited + 30))
  [ $((waited % 600)) -eq 0 ] && echo "ALARM: still waiting on pid=$PREV_PID after ${waited}s $(date -u +%H:%M:%S)"
  if [ "$waited" -ge "$WAIT_DEADLINE" ]; then
    echo "ALARM: wait deadline exceeded; proceeding anyway $(date -u +%H:%M:%S)"
    break
  fi
done
echo "chip free $(date -u +%H:%M:%S)"
echo $$ > /tmp/train.pid

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

last_epoch() {  # $1 = run dir name; prints last completed (<900) epoch or -1
  local last
  last=$(ls -d "runs/$1"/model-epoch-*.chkpt 2>/dev/null \
         | sed 's/.*model-epoch-0*\([0-9]*\)\.chkpt/\1/' \
         | awk '$1 < 900' | sort -n | tail -1)
  echo "${last:--1}"
}

for spec in "$@"; do
  seed=${spec%%:*}
  dir=""
  [ "$spec" != "$seed" ] && dir=${spec#*:}
  echo "=== seed $seed (resume='${dir}') $(date -u +%H:%M:%S)"
  for att in 1 2 3 4 5 6 7 8; do
    if [ -n "$dir" ] && [ "$(last_epoch "$dir")" -ge 29 ]; then
      echo "seed $seed complete (epoch 29 in $dir)"; break
    fi
    until probe; do echo "tunnel down; sleep 120 $(date -u +%H:%M:%S)"; sleep 120; done
    args="--epochs 30 --batch 8 --lr 0.08 --val 0 --no-remat --dilated 0 \
          --seed $seed --save_from 12 ${TRAIN_EXTRA_ARGS:-}"
    if [ -n "$dir" ]; then
      next=$(( $(last_epoch "$dir") + 1 ))
      args="$args --resume $dir --start_epoch $next"
    fi
    before=$(ls runs 2>/dev/null)
    echo "--- attempt $att: $args"
    timeout 4200 python scripts/train_flagship.py $args \
      >> "artifacts/${LOG_PREFIX}$seed.log" 2>&1
    rc=$?
    echo "seed $seed attempt $att exit=$rc $(date -u +%H:%M:%S)"
    if [ -z "$dir" ]; then
      dir=$(comm -13 <(echo "$before") <(ls runs) | grep 2026- | head -1)
      echo "run dir: '$dir'"
    fi
    [ $rc -eq 0 ] && break
    # a run that died before its first save has nothing to resume
    [ -n "$dir" ] && [ "$(last_epoch "$dir")" -lt 0 ] \
      && [ ! -d "runs/$dir/model-epoch-999.chkpt" ] && dir=""
    sleep 30
  done
done
echo "TRAIN QUEUE DONE $(date -u +%H:%M:%S)"
