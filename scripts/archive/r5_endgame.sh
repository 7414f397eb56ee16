#!/bin/bash
# Round-5 release endgame. Run AFTER the training queue finishes.
#
# Stages (each idempotent, bounded, fail-loud — ADVICE round-4 fixes:
# per-path git adds with existence checks, no 2>/dev/null on adds,
# release commit gated on a passing front-door verify):
#   1  seed-51 tail repair (epochs 25-29 into the same lineage dir)
#   2  npz anchors for every finished lineage
#   3  mask-cache populate (all lineages, odd epochs >=15 + SWA)
#   4  finalize_parity (subset search -> oracle re-score -> regression
#      gate -> release package with int8 npz per member)
#   5  fusion spec rebuild (4-CSV pool) + knob re-sweep
#   6  fresh-clone front-door verifies: plain ./run.py AND --fuse
#   7  release commit (ONLY if stage 6 plain verify passed)
#   8  dilated release (best dilated member) + --dilated 1 verify + commit
#   9  benches: default, BENCH_DILATED=1, BENCH_CONV_IMPL=hybrid_deconv
#  10  docs of record regenerated from the artifacts + committed
set -u
cd /root/repo || exit 1
LOG=artifacts/r5_endgame.log
exec >> "$LOG" 2>&1
echo "=== r5_endgame start $(date -u +%H:%M:%S)"

SEED51_DIR=${SEED51_DIR:-2026-08-20T06h03m08s}

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.ones((8,128)).sum()), jax.devices())" \
    >> artifacts/probe.log 2>&1
}

gitc() {  # commit with explicit pathspecs: gitc "msg" path...
  local msg="$1"; shift
  local paths=()
  for p in "$@"; do
    if [ -e "$p" ]; then
      git add -f -- "$p" || { echo "GIT ADD FAILED: $p"; return 1; }
      paths+=("$p")
    else
      echo "GIT ADD SKIP (missing): $p"
    fi
  done
  [ ${#paths[@]} -eq 0 ] && { echo "NOTHING TO COMMIT for: $msg"; return 1; }
  git commit -q -m "$msg" -- "${paths[@]}" \
    && echo "committed: $msg" || echo "commit empty/failed: $msg"
}

# --- 1. seed-51 tail repair -------------------------------------------
# Bounded hard (2 x 20 min) and skippable via REPAIR_CUTOFF_EPOCH (unix
# seconds): with tonight's tunnel flapping every ~20 min, a 3x40min
# worst case here could eat the whole endgame window. The lineage still
# contributes its rehydrated epochs 21+24 without the repair.
if [ ! -d "runs/$SEED51_DIR/model-epoch-029.chkpt" ] \
   && [ -d "runs/$SEED51_DIR/model-epoch-024.chkpt" ] \
   && [ "$(date +%s)" -lt "${REPAIR_CUTOFF_EPOCH:-1787284200}" ]; then
  echo "=== 1. tail repair $SEED51_DIR ($(date -u +%H:%M:%S))"
  for att in 1 2; do
    until probe; do echo "tunnel down; sleep 120"; sleep 120; done
    timeout 1200 python scripts/train_flagship.py \
      --epochs 30 --batch 8 --lr 0.08 --val 0 --no-remat --dilated 0 \
      --seed 51 --save_from 25 --async_saves 1 \
      --resume "$SEED51_DIR" --start_epoch 25 \
      >> artifacts/train_r5_seed51_repair.log 2>&1
    rc=$?
    echo "repair attempt $att exit=$rc"
    [ -d "runs/$SEED51_DIR/model-epoch-029.chkpt" ] && break
    [ "$(date +%s)" -ge "${REPAIR_CUTOFF_EPOCH:-1787284200}" ] && break
    sleep 30
  done
fi

# --- 2. anchors --------------------------------------------------------
echo "=== 2. anchors ($(date -u +%H:%M:%S))"
for d in runs/20*; do
  L=$(basename "$d")
  [ -d "$d/model-epoch-029.chkpt" ] && bash scripts/r5_anchor.sh "$L"
done

# --- 3. populate cache --------------------------------------------------
# Rehydrated anchor lineages hold only a few surviving epochs (even ones
# included, e.g. 16/24), which the odd-epoch auto-expand would skip —
# name them explicitly from the rehydrate manifest.
echo "=== 3. populate ($(date -u +%H:%M:%S))"
REHYD=$(sort -u artifacts/r5_rehydrated_members.txt 2>/dev/null | tr '\n' ' ')
bash scripts/populate_cache_members.sh artifacts/ensemble_r5 $REHYD
echo "populate exit=$? cached=$(ls artifacts/mask_cache/*.npy | wc -l)"

# --- 4. finalize (search -> oracle -> regression gate -> package) ------
echo "=== 4. finalize ($(date -u +%H:%M:%S))"
timeout 7200 python scripts/finalize_parity.py --max_k 10 \
  --out artifacts/ensemble_r5_final --npz 99 --npz_dtype int8 \
  --search_json artifacts/ensemble_search_r5.json \
  > artifacts/finalize_parity_r5.log 2>&1
rc=$?
echo "finalize exit=$rc"
tail -3 artifacts/finalize_parity_r5.log
if [ $rc -ne 0 ]; then
  echo "FINALIZE FAILED - aborting endgame (release untouched)"
  exit 2
fi

# --- 5. fusion spec (4-CSV pool) + re-sweep -----------------------------
echo "=== 5. fusion ($(date -u +%H:%M:%S))"
python scripts/make_fusion_spec.py \
  --csv artifacts/ensemble_final_old_r3.csv:3 \
  --csv artifacts/ensemble_final/submission.csv:3 \
  --csv artifacts/submission_r1_final/submission.csv:2 \
  --csv artifacts/submission_r1b/submission.csv:2 \
  --notes "r5 pool: two destroyed-weights release generations (0.97416, 0.97406 solo) + two single-run lineages" \
  && python scripts/fusion_sweep.py --apply \
       --thresholds 0.42,0.46,0.48,0.50,0.52,0.54,0.56,0.58,0.60,0.62 \
       --out artifacts/fusion_sweep_r5.json \
       > artifacts/fusion_sweep_r5.log 2>&1
echo "fusion exit=$?"

# --- 6. fresh-clone verifies (plain FIRST - the number a fresh user gets)
echo "=== 6. fresh-clone verifies ($(date -u +%H:%M:%S))"
rm -rf /tmp/fresh_r5
git clone -q /root/repo /tmp/fresh_r5
# the clone has only committed state; overlay the (not-yet-committed)
# stage-4 release so this verifies exactly what stage 7 will commit
rsync -a --delete artifacts/release/ /tmp/fresh_r5/artifacts/release/
# npz-only: strip Orbax payloads so the verify restores from npz alone
for d in /tmp/fresh_r5/artifacts/release/*.chkpt; do
  [ -d "$d" ] && rm -rf "$d"
done
for mode in plain fuse; do
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  extra=""; [ $mode = fuse ] && extra="--fuse"
  (cd /tmp/fresh_r5 && timeout 2400 python run.py $extra \
     --out "out_$mode" > "run_$mode.log" 2>&1; echo "verify $mode exit=$?")
  mkdir -p "artifacts/run_verify_r5_$mode"
  for f in "/tmp/fresh_r5/out_$mode/submission.csv" \
           "/tmp/fresh_r5/run_$mode.log"; do
    [ -e "$f" ] && cp "$f" "artifacts/run_verify_r5_$mode/"
  done
  python scripts/score_submission.py "artifacts/run_verify_r5_$mode" \
    && cat "artifacts/run_verify_r5_$mode/parity_vs_winner.json"
done

# --- 7. release commit, gated on the PLAIN verify ------------------------
echo "=== 7. release commit ($(date -u +%H:%M:%S))"
PLAIN_OK=$(python -c "
import json
try:
    r = json.load(open('artifacts/run_verify_r5_plain/parity_vs_winner.json'))
    print(1 if r['agreement'] >= 0.97 else 0)
except Exception:
    print(0)")
if [ "$PLAIN_OK" = "1" ]; then
  gitc "Round-5 release: cross-lineage ensemble, npz-per-member, front-door verified" \
    artifacts/release/release.json artifacts/release/fusion.json \
    artifacts/release/*.npz \
    artifacts/ensemble_r5_final artifacts/ensemble_search_r5.json \
    artifacts/finalize_parity_r5.log artifacts/fusion_sweep_r5.json \
    artifacts/run_verify_r5_plain artifacts/run_verify_r5_fuse
else
  echo "PLAIN VERIFY FAILED OR <0.97 - release NOT committed"
  exit 3
fi

# --- 8. dilated release + verify ----------------------------------------
echo "=== 8. dilated release ($(date -u +%H:%M:%S))"
DIL=$(python -c "
import json, glob, os
# dilated lineages = run dirs whose geometry sidecar says dilated
best, score = None, -1
singles = json.load(open('artifacts/ensemble_search_r5.json'))['singles']
dil_lineages = set()
for g in glob.glob('runs/*/model-epoch-0*.chkpt/geometry.json'):
    if json.load(open(g)).get('dilated_layers'):
        dil_lineages.add(g.split(os.sep)[1])
for name, agr in singles.items():
    date, ep = name.rsplit('_epoch', 1)
    if date in dil_lineages and agr > score:
        best, score = f'{date}:{int(ep)}', agr
print(best or '')")
if [ -n "$DIL" ]; then
  echo "dilated pick: $DIL"
  python scripts/make_release.py --member "$DIL" \
    --npz 99 --npz_dtype int8 --out artifacts/release_dilated \
    --score-json "{}" \
    --notes "reference run.py parity config (dilated); best dilated single" \
    > artifacts/release_dilated.log 2>&1
  echo "dilated package exit=$?"
  rsync -a --delete artifacts/release_dilated/ \
    /tmp/fresh_r5/artifacts/release_dilated/
  for d in /tmp/fresh_r5/artifacts/release_dilated/*.chkpt; do
    [ -d "$d" ] && rm -rf "$d"
  done
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  (cd /tmp/fresh_r5 && timeout 2400 python run.py --dilated 1 \
     --out out_dilated > run_dilated.log 2>&1; echo "verify dilated exit=$?")
  mkdir -p artifacts/run_verify_r5_dilated
  for f in /tmp/fresh_r5/out_dilated/submission.csv \
           /tmp/fresh_r5/run_dilated.log; do
    [ -e "$f" ] && cp "$f" artifacts/run_verify_r5_dilated/
  done
  python scripts/score_submission.py artifacts/run_verify_r5_dilated \
    && gitc "Dilated parity release (./run.py --dilated 1) + fresh-clone verify" \
        artifacts/release_dilated/release.json \
        artifacts/release_dilated/*.npz \
        artifacts/release_dilated.log artifacts/run_verify_r5_dilated
else
  echo "NO DILATED MEMBER IN CACHE - skipping dilated release"
fi

# --- 9. benches (stderr separated, parse-guarded: ADVICE r4) -------------
echo "=== 9. benches ($(date -u +%H:%M:%S))"
bench_row() {  # $1 name, rest env pairs
  local name=$1; shift
  local json="artifacts/bench_r5_$name.json"
  if python -c "import json; json.load(open('$json'))" 2>/dev/null; then
    echo "bench $name already parsed OK"; return
  fi
  until probe; do echo "tunnel down; sleep 120"; sleep 120; done
  timeout 1800 env "$@" python bench.py \
    2> "artifacts/bench_r5_$name.stderr.log" \
    | grep '^{' | tail -1 > "$json"
  python -c "import json; print('bench $name:', json.load(open('$json')))" \
    || echo "BENCH $name FAILED (artifacts/bench_r5_$name.stderr.log)"
}
bench_row default BENCH_IMAGES=20
bench_row dilated BENCH_DILATED=1 BENCH_IMAGES=20
bench_row hybrid_deconv BENCH_CONV_IMPL=hybrid_deconv BENCH_IMAGES=20
gitc "Round-5 bench rows (default / dilated / hybrid_deconv predict)" \
  artifacts/bench_r5_default.json artifacts/bench_r5_dilated.json \
  artifacts/bench_r5_hybrid_deconv.json

# --- 10. docs of record ---------------------------------------------------
echo "=== 10. docs ($(date -u +%H:%M:%S))"
python scripts/update_docs.py \
  --pure_verify artifacts/run_verify_r5_plain/parity_vs_winner.json \
  --fused_verify artifacts/run_verify_r5_fuse/parity_vs_winner.json \
  --dilated_verify artifacts/run_verify_r5_dilated/parity_vs_winner.json \
  --bench artifacts/bench_r5_default.json \
  && gitc "Docs of record regenerated from round-5 artifacts" \
       README.md PARITY.md
touch /tmp/r5_endgame.done
echo "=== r5_endgame done $(date -u +%H:%M:%S)"
