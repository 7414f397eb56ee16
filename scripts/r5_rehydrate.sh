#!/bin/bash
# Round-5 rehydrate: rebuild runs/<date>/model-epoch-NNN.chkpt from every
# git-committed npz weight blob (anchors + current release members).
#
# Needed because the third VM reset of the round wiped runs/ AND the mask
# cache; the committed int8 npz files are the only durable weight channel
# (reference analogue: SHA-verified weight download, run.py:46-119).
# CPU-only (rematerialize_npz forces jax_platforms=cpu) so it can run
# while the TPU is busy training and even while the tunnel is down.
#
# Side effect: writes artifacts/r5_rehydrated_members.txt (DATE:EPOCH per
# line) so the endgame populate stage can name these members explicitly —
# rehydrated lineages hold only a few epochs and may miss the auto-expand
# heuristics.
set -u
cd /root/repo || exit 1
OUT=artifacts/r5_rehydrated_members.txt
: > "$OUT.tmp"
for npz in artifacts/anchors/*.chkpt.npz artifacts/release/*.chkpt.npz \
           artifacts/release_dilated/*.chkpt.npz; do
  [ -e "$npz" ] || continue
  base=$(basename "$npz")
  date=${base%-epoch-*}
  ep=$(echo "$base" | sed 's/.*-epoch-0*\([0-9]*\)\.chkpt\.npz/\1/')
  # Manifest only lists members that actually exist on disk (ADVICE
  # round 5): append AFTER the hydrate succeeds (or was already done) so
  # a failed/timed-out rematerialize can't silently shrink the ensemble
  # downstream (ensemble_runs skips missing members with just a log line).
  if [ -d "runs/$date/model-epoch-$(printf %03d "$ep").chkpt" ]; then
    echo "already hydrated: $date:$ep"
    echo "$date:$ep" >> "$OUT.tmp"
    continue
  fi
  if timeout 600 python scripts/rematerialize_npz.py "$npz"; then
    echo "$date:$ep" >> "$OUT.tmp"
  else
    echo "REHYDRATE FAILED: $npz"
  fi
done
sort -u "$OUT.tmp" > "$OUT" && rm -f "$OUT.tmp"
echo "rehydrated members: $(tr '\n' ' ' < "$OUT")"
