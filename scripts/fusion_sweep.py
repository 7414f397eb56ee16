#!/usr/bin/env python3
"""CPU sweep of the cross-generation fusion knobs on the CURRENT release.

``./run.py --fuse`` fuses the release members' binary patch votes
(weight ``member_weight`` each) with archived earlier-generation
submission CSVs (per-CSV weights) at ``vote_threshold`` (ties -> road);
semantics in ``run.py`` (member_vote / csv_votes). The round-3b sweep
picked the CSV weights for a FIVE-member release — when the member set
changes, the member/CSV balance shifts and the knobs should be re-swept.

This recomputes the fused agreement vs the reference winner for a grid
of (member_weight, vote_threshold) purely from the members' cached
probability masks (``artifacts/mask_cache``, written by
``scripts/ensemble_runs.py``) and the fusion CSVs — pure NumPy, ~ms per
grid point, no TPU. The CSV weight RATIOS stay as packaged
(``fusion.json``); scaling all member votes against them spans the same
subspace as rescaling the CSVs jointly.

Reference counterpart: none — the reference ships one hand-picked
checkpoint (``run.py:121-137``); fusion is this repo's ensemble-of-
generations extension (PARITY.md round 3b).

Usage:
  python scripts/fusion_sweep.py [--apply]
      [--out artifacts/fusion_sweep_r4.json]

``--apply`` rewrites fusion.json's member_weight/vote_threshold to the
best grid point (CSV list and weights unchanged).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.utils import scoring

WINNER = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
          "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
          "submission.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--release", default="artifacts/release/release.json")
    p.add_argument("--fusion", default="artifacts/release/fusion.json")
    p.add_argument("--cache", default="artifacts/mask_cache")
    p.add_argument("--winner", default=WINNER)
    p.add_argument("--member_weights", default="0.5,0.75,1.0,1.25,1.5,2.0")
    p.add_argument("--thresholds",
                   default="0.40,0.44,0.48,0.50,0.52,0.56,0.60")
    p.add_argument("--apply", action="store_true",
                   help="write the selected (member_weight, vote_threshold) "
                        "back into fusion.json")
    p.add_argument("--select", default="agreement",
                   choices=("agreement", "fraction"),
                   help="how --apply picks the grid point: 'agreement' "
                        "maximizes agreement with --winner (oracle); "
                        "'fraction' picks the point whose fused road "
                        "fraction is closest to --target_frac WITHOUT "
                        "scoring against the winner — the held-out "
                        "calibration rule (PARITY.md round 4: the "
                        "reference family's late models hold a stable "
                        "0.2495-0.2505 fraction; ours run ~0.26 high)")
    p.add_argument("--target_frac", type=float, default=0.2501,
                   help="target road fraction for --select fraction "
                        "(default 0.2501 = the mean fraction of the "
                        "reference's own NON-winner late 6-layer "
                        "submissions, PARITY.md round-2 table — no "
                        "winner-CSV statistic involved)")
    p.add_argument("--out", default="artifacts/fusion_sweep_r4.json")
    args = p.parse_args(argv)

    with open(args.release) as f:
        release = json.load(f)
    with open(args.fusion) as f:
        fusion = json.load(f)

    member_labels = []
    for m in release.get("members") or [release]:
        date, ep = m["source_experiment"], int(m["source_epoch"])
        cachef = os.path.join(args.cache, f"{date}_epoch{ep:03d}.npy")
        if not os.path.exists(cachef):
            print(f"missing cached masks for member {date}:{ep} ({cachef}); "
                  f"populate the cache first", file=sys.stderr)
            return 1
        masks = np.load(cachef)
        member_labels.append(scoring.mask_labels(
            masks, IMG_PATCH_SIZE, FOREGROUND_THRESHOLD).astype(np.float64))

    csv_votes = []
    for vote in fusion["csv_votes"]:
        path = os.path.join(REPO, vote["path"])
        csv_votes.append((scoring.submission_labels(
            path, IMG_PATCH_SIZE).astype(np.float64), float(vote["weight"])))

    win = scoring.submission_labels(args.winner, IMG_PATCH_SIZE)

    member_sum = np.sum(member_labels, axis=0)
    csv_sum = np.sum([lab * w for lab, w in csv_votes], axis=0)
    csv_w = sum(w for _, w in csv_votes)

    rows = []
    for mw, t in itertools.product(
            (float(x) for x in args.member_weights.split(",")),
            (float(x) for x in args.thresholds.split(","))):
        w_total = mw * len(member_labels) + csv_w
        fused = (member_sum * mw + csv_sum) / w_total > t - 1e-9
        agree = float((fused == win).mean())
        rows.append({"member_weight": mw, "vote_threshold": t,
                     "agreement": round(agree, 5),
                     "road_frac": round(float(fused.mean()), 4)})

    rows.sort(key=lambda r: -r["agreement"])
    packaged = {"member_weight": float(fusion.get("member_weight", 1.0)),
                "vote_threshold": float(fusion.get("vote_threshold", 0.5))}
    current = next((r for r in rows
                    if r["member_weight"] == packaged["member_weight"]
                    and r["vote_threshold"] == packaged["vote_threshold"]),
                   None)
    # held-out selection: closest fused road fraction to the target,
    # ties broken toward the packaged member_weight (the fraction rule
    # constrains only the threshold axis; many (mw, t) points share a
    # fused labeling). Its agreement is reported for validation but
    # never used for selection.
    frac_pick = min(rows, key=lambda r: (abs(r["road_frac"]
                                             - args.target_frac),
                                         abs(r["member_weight"] - 1.25)))
    selected = rows[0] if args.select == "agreement" else frac_pick
    result = {"members": len(member_labels), "csv_votes": len(csv_votes),
              "csv_weight_total": csv_w, "packaged": current,
              "best": rows[0],
              "fraction_matched": {**frac_pick,
                                   "target_frac": args.target_frac,
                                   "regret_vs_oracle": round(
                                       rows[0]["agreement"]
                                       - frac_pick["agreement"], 5)},
              "selected_by": args.select, "top8": rows[:8]}
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump({**result, "grid": rows}, f, indent=2)

    if args.apply:
        fusion["member_weight"] = selected["member_weight"]
        fusion["vote_threshold"] = selected["vote_threshold"]
        note = (f"member_weight/vote_threshold selected by {args.select} "
                f"(fusion_sweep.py: {selected['agreement']:.5f} vs "
                f"packaged {current['agreement'] if current else '?'})")
        fusion["notes"] = fusion.get("notes", "") + " | " + note
        with open(args.fusion, "w") as f:
            json.dump(fusion, f, indent=2)
            f.write("\n")
        print(f"applied to {args.fusion}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
