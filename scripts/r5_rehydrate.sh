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
  echo "$date:$ep" >> "$OUT.tmp"
  if [ -d "runs/$date/model-epoch-$(printf %03d "$ep").chkpt" ]; then
    echo "already hydrated: $date:$ep"
    continue
  fi
  timeout 600 python scripts/rematerialize_npz.py "$npz" \
    || echo "REHYDRATE FAILED: $npz"
done
sort -u "$OUT.tmp" > "$OUT" && rm -f "$OUT.tmp"
echo "rehydrated members: $(tr '\n' ' ' < "$OUT")"
