#!/bin/bash
# Anchor watcher: commits an int8 npz anchor for every lineage the moment
# it reaches epoch 29, instead of waiting for the endgame (durability:
# four VM resets have shown gitignored Orbax payloads do not survive).
# Idempotent alongside r5_endgame stage 2 (r5_anchor.sh skips existing).
set -u
cd /root/repo || exit 1
# Wall-clock deadline (ADVICE round 5): the endgame touches its done
# sentinel only on full success, so an early endgame abort used to leave
# this watcher looping forever. Default 4 h covers any training queue.
DEADLINE=$(( $(date +%s) + ${WATCH_DEADLINE_S:-14400} ))
while [ ! -f /tmp/r5_endgame.done ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  for d in runs/20*; do
    [ -d "$d/model-epoch-029.chkpt" ] || continue
    L=$(basename "$d")
    [ -s "artifacts/anchors/$L-epoch-029.chkpt.npz" ] && continue
    bash scripts/r5_anchor.sh "$L" >> artifacts/r5_anchor_watch.log 2>&1
  done
  sleep 120
done
