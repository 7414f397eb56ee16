#!/bin/bash
# XLA scheduler/fusion flag sweep on the non-dilated batch-8 train step
# (VERDICT round-4 task 5: one flag sweep before concluding the 2.6x
# roofline gap is compiler-owned). Flags verified present in this
# libtpu build via `strings libtpu.so`. Each variant is a fresh process
# (flags are read at backend init); results append to one JSONL.
#
# Flags are passed through BOTH XLA_FLAGS and LIBTPU_INIT_ARGS — the
# axon backend may route compilation through either path; identical
# timings across all variants would mean the flags never reach the
# compiler (also a result: records that the tunnel pins compiler
# defaults).
set -u
cd /root/repo || exit 1
OUT=${1:-artifacts/xla_flag_sweep_r5.jsonl}
STEPS=${STEPS:-30}
BATCH=${BATCH:-8}

declare -a NAMES=(
  baseline
  vmem32m
  vmem64m
  no_latency_sched
  conv_perf_target
  no_conv_input_fusion
  no_conv_output_fusion
  mof
)
declare -a FLAGS=(
  ""
  "--xla_tpu_scoped_vmem_limit_kib=32768"
  "--xla_tpu_scoped_vmem_limit_kib=65536"
  "--xla_tpu_enable_latency_hiding_scheduler=false"
  "--xla_jf_convolution_performance_target=1.0"
  "--xla_jf_conv_input_fusion=false"
  "--xla_jf_conv_output_fusion=false"
  "--xla_jf_enable_advanced_multi_output_fusion=true"
)

for i in "${!NAMES[@]}"; do
  name=${NAMES[$i]}
  flags=${FLAGS[$i]}
  if grep -q "\"flag_variant\": \"$name\"" "$OUT" 2>/dev/null; then
    echo "skip $name (already measured)"
    continue
  fi
  echo "=== $name: '$flags' $(date -u +%H:%M:%S)"
  # LIBTPU_INIT_ARGS only: the tunneled build's CLIENT-side XLA parser
  # hard-aborts (F parse_flags_from_env) on TPU-compiler flags in
  # XLA_FLAGS, before the backend ever sees them — compilation happens
  # terminal-side, so the libtpu init path is the only viable carrier.
  row=$(timeout 900 env LIBTPU_INIT_ARGS="$flags" \
    python scripts/bench_train.py --dilated 0 --batch "$BATCH" \
      --steps "$STEPS" --variants noremat 2>"artifacts/xla_sweep_$name.log" \
    | tail -1; exit "${PIPESTATUS[0]}")
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$row" ]; then
    echo "{\"flag_variant\": \"$name\", \"flags\": \"$flags\", \"error\": \"exit $rc\"}" >> "$OUT"
    echo "FAILED $name (exit $rc; artifacts/xla_sweep_$name.log)"
    continue
  fi
  # merge the variant label into the bench row (single-line JSON)
  echo "$row" | python -c "
import json, sys
r = json.loads(sys.stdin.read())
r['flag_variant'] = '$name'
r['flags'] = '$flags'
print(json.dumps(r))" >> "$OUT"
  tail -1 "$OUT"
done
echo "sweep done -> $OUT"
