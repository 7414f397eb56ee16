#!/bin/bash
# Anchor freshly trained lineages into git as int8 npz, the moment they
# finish (durability-first: four VM resets have destroyed every
# gitignored Orbax payload; the committed npz is the only channel that
# survives). ADVICE round-4 fixes applied: each commit uses an explicit
# pathspec so an anchor commit can only ever contain its anchor file,
# and failures are loud, not 2>/dev/null'd away.
#
# Usage: r5_anchor.sh LINEAGE_DIR_NAME...
set -u
cd /root/repo || exit 1
rc=0
for L in "$@"; do
  if [ ! -d "runs/$L/model-epoch-029.chkpt" ]; then
    echo "ANCHOR SKIP: no epoch-029 in runs/$L" >&2
    rc=1
    continue
  fi
  out="artifacts/anchors/$L-epoch-029.chkpt.npz"
  mkdir -p artifacts/anchors
  # Per-lineage lock (ADVICE round 5): the anchor watcher polls every
  # 120 s while the endgame's anchor stage can invoke this script on the
  # same lineage concurrently; without exclusion both could export the
  # same anchor at once. export_npz itself now publishes atomically
  # (temp + os.replace), the lock just prevents duplicate work and
  # interleaved git index updates.
  exec 9> "/tmp/anchor_$L.lock"
  if ! flock -w 600 9; then
    echo "ANCHOR FAIL: lock on $L held too long" >&2
    rc=1
    continue
  fi
  if [ ! -s "$out" ]; then
    if ! timeout 900 python scripts/export_npz.py \
        --ckpt "runs/$L/model-epoch-029.chkpt" \
        --out "$out" --dtype int8 > "artifacts/anchor_$L.log" 2>&1; then
      echo "ANCHOR FAIL: export of $L failed (artifacts/anchor_$L.log)" >&2
      rc=1
      continue
    fi
  fi
  # Validate before committing: a truncated/corrupt npz must not become
  # the "durable" anchor. __geometry__ is written last by export_npz, so
  # its presence plus a clean np.load proves a complete archive.
  if ! python -c "
import numpy as np, sys
with np.load(sys.argv[1]) as z:
    assert '__geometry__' in z.files, 'no __geometry__ (partial export?)'
    assert any(k.startswith('params/') for k in z.files), 'no params'
" "$out"; then
    echo "ANCHOR FAIL: $out failed validation; not committing" >&2
    rc=1
    continue
  fi
  git add -f -- "$out"
  if git commit -q -m "Anchor lineage $L: git-committed int8 npz of epoch 29" \
       -- "$out"; then
    echo "anchor $L committed ($(du -h "$out" | cut -f1))"
  else
    echo "anchor $L: nothing to commit (already anchored)"
  fi
done
exit $rc
