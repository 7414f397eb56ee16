#!/bin/bash
# Round-6 chip pipeline: idempotent, stage-resumable (VERDICT r5 task 4).
#
# Every stage writes a done-marker under artifacts/r6_markers/ and is
# skipped on re-run; killing this driver at any stage and re-running
# completes only the remaining stages. No bare external binaries: every
# non-coreutils dependency is checked with `command -v` up front (the
# r5 endgame died on an unchecked `rsync`).
#
# Stages:
#   V1  fresh-clone ./run.py          -> artifacts/run_verify_r6_plain
#   V2  fresh-clone ./run.py --fuse   -> artifacts/run_verify_r6_fuse
#   V3  fresh-clone ./run.py --dilated 1 -> artifacts/run_verify_r6_dilated
#   V4  bench.py re-run against the shipped release (task 8)
#
# Each verify clones committed HEAD only — no working-tree overlay — so
# what is verified is exactly what a user gets.  Commits happen per
# stage (a later tunnel flap cannot strand an earlier verified result).
set -u
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
MARK=artifacts/r6_markers
mkdir -p "$MARK"
LOG=artifacts/r6_chipline.log
exec >> "$LOG" 2>&1
echo "=== r6_chipline start $(date -u +%H:%M:%S)"

for bin in git python timeout; do
  command -v "$bin" >/dev/null || { echo "FATAL: $bin missing"; exit 9; }
done

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

gitc() {  # commit specific paths with a message; never fails the driver
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && echo "committed: $msg" || \
    echo "commit no-op: $msg"
}

CLONE=/tmp/fresh_r6
fresh_clone() {
  rm -rf "$CLONE"
  git clone -q /root/repo "$CLONE"
}

verify() {  # $1 = mode (plain|fuse|dilated), $2 = extra run.py args
  local mode=$1 extra=$2
  local out="artifacts/run_verify_r6_$mode"
  fresh_clone
  until probe; do echo "tunnel down; sleep 120 $(date -u +%H:%M:%S)"; sleep 120; done
  (cd "$CLONE" && timeout 2400 python run.py $extra \
     --out "out_$mode" > "run_$mode.log" 2>&1; echo "verify $mode exit=$?")
  mkdir -p "$out"
  for f in "$CLONE/out_$mode/submission.csv" "$CLONE/run_$mode.log"; do
    [ -e "$f" ] && cp -a "$f" "$out/"
  done
  [ -s "$out/submission.csv" ] || { echo "VERIFY $mode: no submission"; return 1; }
  python scripts/score_submission.py "$out" && cat "$out/parity_vs_winner.json"
}

# --- V1: plain ----------------------------------------------------------
if [ ! -e "$MARK/v1_plain" ]; then
  echo "=== V1 plain verify ($(date -u +%H:%M:%S))"
  if verify plain ""; then
    touch "$MARK/v1_plain"
    gitc "Fresh-clone front-door verify of the shipped 5-member release" \
      artifacts/run_verify_r6_plain
  else
    echo "V1 FAILED"
  fi
fi

# --- V2: fuse -----------------------------------------------------------
if [ ! -e "$MARK/v2_fuse" ]; then
  echo "=== V2 fuse verify ($(date -u +%H:%M:%S))"
  if verify fuse "--fuse"; then
    touch "$MARK/v2_fuse"
    gitc "Fresh-clone --fuse front-door verify (5-member release + fusion.json)" \
      artifacts/run_verify_r6_fuse
  else
    echo "V2 FAILED"
  fi
fi

# --- V3: dilated --------------------------------------------------------
if [ ! -e "$MARK/v3_dilated" ]; then
  echo "=== V3 dilated verify ($(date -u +%H:%M:%S))"
  if verify dilated "--dilated 1"; then
    touch "$MARK/v3_dilated"
    gitc "Fresh-clone --dilated 1 front-door verify (packaged dilated release)" \
      artifacts/run_verify_r6_dilated
  else
    echo "V3 FAILED"
  fi
fi

# --- V4: bench re-coupled to the shipped release ------------------------
if [ ! -e "$MARK/v4_bench" ]; then
  echo "=== V4 bench ($(date -u +%H:%M:%S))"
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1200 python bench.py > /tmp/bench_r6.out 2> /tmp/bench_r6.err
  rc=$?
  echo "bench exit=$rc"; tail -2 /tmp/bench_r6.out
  if [ $rc -eq 0 ] && tail -1 /tmp/bench_r6.out | python -c "
import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
    tail -1 /tmp/bench_r6.out > artifacts/bench_r6_release.json
    touch "$MARK/v4_bench"
    gitc "Re-run headline bench against the shipped 5-member release" \
      artifacts/bench_r6_release.json
  else
    echo "V4 FAILED"; cat /tmp/bench_r6.err | tail -5
  fi
fi

echo "=== r6_chipline done $(date -u +%H:%M:%S)"
touch "$MARK/chipline_done"
