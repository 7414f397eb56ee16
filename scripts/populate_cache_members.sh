#!/bin/bash
# Resilient mask-cache populate for an arbitrary member list.
# Usage: populate_cache_members.sh OUTDIR DATE:EPOCH [DATE:EPOCH ...]
# Retries through tunnel outages/wedges: each attempt is bounded, cached
# members are skipped instantly, so a killed attempt resumes where it
# left off. Stops when ensemble_runs.py completes a full scored pass.
set -u
cd /root/repo
OUT=${1:?usage: populate_cache_members.sh OUTDIR DATE:EPOCH...}
shift
MEMBERS=""
for m in "$@"; do MEMBERS="$MEMBERS --member $m"; done
# Auto-expand (POPULATE_AUTO_EXPAND=0 disables): the round-4 release
# pipeline builds its member list under a CUT_POP wall-clock deadline
# that can lapse while late lineages are still training, collapsing the
# list to one member. The subset search reads the CACHE, so recompute
# the intended set here: for each completed lineage (epoch-029 on
# disk), ensure its SWA (epoch 900) exists, then add odd epochs >=15
# plus the SWA (PARITY.md round 3: consecutive epochs add search space,
# not diversity).
if [ "${POPULATE_AUTO_EXPAND:-1}" = "1" ]; then
  for d in $(ls -d runs/20* 2>/dev/null); do
    L=$(basename "$d")
    # a lineage qualifies once it has reached the selection band
    # (any epoch >= 15 on disk); round 5: rehydrated anchor lineages
    # hold only a few surviving epochs (e.g. 21+24), so the gate must
    # look at the best epoch present, not require one specific file
    best=$(ls -d "$d"/model-epoch-0*.chkpt 2>/dev/null \
           | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' \
           | awk '$1 < 900' | sort -n | tail -1)
    [ "${best:--1}" -ge 15 ] || continue
    # SWA needs >=2 distinct epochs on disk to average anything
    n_eps=$(ls -d "$d"/model-epoch-0*.chkpt 2>/dev/null | wc -l)
    if ! ls -d "$d"/model-epoch-900.chkpt >/dev/null 2>&1 \
       && [ "$n_eps" -ge 2 ]; then
      # read the lineage's own architecture from its geometry sidecar
      # (round 5 adds a dilated lineage; --dilated 0 was wrong for it);
      # use the best epoch present, not a hardcoded 029
      DIL=$(python -c "
import json, sys
try:
    g = json.load(open('$d/model-epoch-$(printf %03d "$best").chkpt/geometry.json'))
    print(1 if g.get('dilated_layers') else 0)
except Exception:
    print(0)")
      # SWA averages the last six epochs that exist on disk
      EPS=$(ls -d "$d"/model-epoch-0*.chkpt 2>/dev/null \
            | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n \
            | tail -6 | paste -sd,)
      timeout 900 python scripts/average_checkpoints.py --date "$L" \
        --epochs "$EPS" --dilated "$DIL" >> "${OUT}_swa.log" 2>&1 \
        && echo "auto SWA $L (dilated=$DIL epochs=$EPS)"
    fi
    for e in $(ls -d "$d"/model-epoch-*.chkpt 2>/dev/null \
               | sed 's/.*epoch-0*\([0-9]*\)\.chkpt/\1/' | sort -n); do
      if [ "$e" -eq 900 ] || { [ "$e" -ge 15 ] && [ "$e" -lt 900 ] \
           && [ $((e % 2)) -eq 1 ]; }; then
        case " $* " in
          *" $L:$e "*) ;;
          *) MEMBERS="$MEMBERS --member $L:$e" ;;
        esac
      fi
    done
  done
fi
LOG="${OUT}_populate.log"
for attempt in $(seq 1 30); do
  have=$(ls artifacts/mask_cache/*.npy 2>/dev/null | wc -l)
  echo "=== attempt $attempt: $have cached total $(date -u +%H:%M:%S) ==="
  timeout 2400 python scripts/ensemble_runs.py $MEMBERS --out "$OUT" \
    >> "$LOG" 2>&1
  rc=$?
  echo "attempt $attempt exit=$rc"
  [ $rc -eq 0 ] && { echo "DONE (scored)"; exit 0; }
  sleep 60
done
echo "GAVE UP"
exit 1
