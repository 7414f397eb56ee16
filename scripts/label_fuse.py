#!/usr/bin/env python3
"""Patch-label fusion across ensemble generations.

The round-3 VM reset destroyed all checkpoints and the probability-mask
cache, but the *submission CSVs* of the old independent lineages
survived (``artifacts/ensemble_final`` — the released best-6 ensemble
spanning three runs, 0.97416 agreement — plus two single-run CSVs from
two further lineages). Those patch labels are the only remaining
signal from five independently-trained models, and their errors are
uncorrelated with the freshly retrained seeds' errors.

This host-side tool fuses, per 16x16 Kaggle patch:

  * CSV members  — archived submissions, a {0,1} vote each
    (parsed with ``ensemble_search.load_ref_labels``, i.e. the same
    x-outer/y-inner order as reference ``images.py:232-236``);
  * mask members — cached probability masks (``artifacts/mask_cache``),
    each converted to its own binary patch decision via the production
    quantize pipeline (binarize 0.5 -> patch fraction -> 0.25 threshold,
    reference ``images.py:256-266`` + ``:88-99``) so every model casts
    one vote regardless of which generation it came from.

Fusion = weighted mean of votes, thresholded at --vote_threshold
(default 0.5, i.e. simple majority; sweep reported for transparency).
Scores against the reference winner like every other parity tool.

Usage:
  python scripts/label_fuse.py \
      --csv artifacts/ensemble_final/submission.csv:6 \
      --csv artifacts/submission_r1_final/submission.csv:1 \
      --members auto            # best subset from ensemble_search.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE

import ensemble_search


def load_csv_labels(path: str) -> np.ndarray:
    """Submission CSV -> labels[img, x-block, y-block], geometry inferred."""
    import re
    pat = re.compile(r"^(\d+)_(\d+)_(\d+),(\d)$")
    rows = []
    with open(path) as f:
        assert f.readline().strip() == "id,prediction"
        for line in f:
            m = pat.match(line.strip())
            n, x, y, label = (int(g) for g in m.groups())
            rows.append((n, x // IMG_PATCH_SIZE, y // IMG_PATCH_SIZE, label))
    num = max(r[0] for r in rows)
    pps = max(r[1] for r in rows) + 1
    lab = np.full((num, pps, pps), -1, np.int8)
    for n, x, y, label in rows:
        lab[n - 1, x, y] = label
    assert (lab >= 0).all(), f"{path} has holes"
    return lab


def mask_member_votes(cache: str, names: list[str]) -> np.ndarray:
    """Each cached mask -> its own binary patch decision [n, x, y]."""
    votes = []
    for n in names:
        mask = np.load(os.path.join(cache, n + ".npy"))
        mask = mask.squeeze(-1).astype(np.float32)
        pps = mask.shape[1] // IMG_PATCH_SIZE
        pm = ensemble_search.patch_probs(mask, pps)       # [n, y, x]
        votes.append((pm.transpose(0, 2, 1) > FOREGROUND_THRESHOLD))
    return np.stack(votes).astype(np.float32)             # [m, n, x, y]


def agreement(lab: np.ndarray, ref: np.ndarray) -> dict:
    refb = ref.astype(bool)
    tp = int((lab & refb).sum()); fp = int((lab & ~refb).sum())
    fn = int((~lab & refb).sum()); tn = int((~lab & ~refb).sum())
    total = lab.size
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {"agreement": (tp + tn) / total,
            "f1_vs_ref": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
            "road_frac_a": (tp + fp) / total,
            "road_frac_b": (tp + fn) / total, "total": total}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", action="append", default=[],
                   help="submission.csv[:weight] — an archived patch-label "
                        "member (weight default 1)")
    p.add_argument("--members", default=None,
                   help="'auto' = best subset in --search_json; 'all' = every "
                        "cached mask; or comma-separated cache basenames")
    p.add_argument("--member_weight", type=float, default=1.0,
                   help="vote weight of EACH mask member")
    p.add_argument("--cache", default="artifacts/mask_cache")
    p.add_argument("--search_json", default="artifacts/ensemble_search.json")
    p.add_argument("--ref", default=ensemble_search.REF_BEST)
    p.add_argument("--vote_threshold", type=float, default=0.5)
    p.add_argument("--out", default="artifacts/label_fuse.json")
    p.add_argument("--write_csv", default=None,
                   help="write the fused submission CSV here")
    args = p.parse_args(argv)

    votes, weights, names = [], [], []

    for spec in args.csv:
        path, _, w = spec.partition(":")
        w = float(w) if w else 1.0
        lab = load_csv_labels(path)
        votes.append(lab.astype(np.float32))
        weights.append(w)
        names.append(f"csv:{path}:{w}")

    if args.members:
        if args.members == "auto" and os.path.exists(args.search_json):
            with open(args.search_json) as f:
                search = json.load(f)
            _, best = max(search["best_by_k"].items(),
                          key=lambda kv: kv[1]["agreement"])
            mnames = best["members"]
        elif args.members in ("auto", "all"):
            mnames = sorted(f[:-4] for f in os.listdir(args.cache)
                            if f.endswith(".npy"))
        else:
            mnames = args.members.split(",")
        mv = mask_member_votes(args.cache, mnames)
        for i, n in enumerate(mnames):
            votes.append(mv[i])
            weights.append(args.member_weight)
            names.append(f"mask:{n}:{args.member_weight}")

    if not votes:
        raise SystemExit("no members: pass --csv and/or --members")

    v = np.stack(votes)                                    # [m, n, x, y]
    w = np.asarray(weights, np.float32)[:, None, None, None]
    mean_vote = (v * w).sum(axis=0) / w.sum()

    ref = ensemble_search.load_ref_labels(
        args.ref, v.shape[1], v.shape[2])

    print(f"{len(votes)} members (total weight {w.sum():g}):")
    for n in names:
        print(f"  {n}")

    results = {"members": names, "by_threshold": {}}
    # ties at exactly t resolve to road=False for t=0.5 majority; sweep
    # reported so the choice is visible
    for t in sorted({args.vote_threshold, 0.34, 0.4, 0.45, 0.5, 0.55,
                     0.6, 0.66}):
        lab = mean_vote > t - 1e-9
        r = agreement(lab, ref)
        results["by_threshold"][str(t)] = round(r["agreement"], 5)
        flag = " <- selected" if t == args.vote_threshold else ""
        print(f"  t={t:4}: agreement {r['agreement']:.5f} "
              f"road_frac {r['road_frac_a']:.4f}{flag}")

    lab = mean_vote > args.vote_threshold - 1e-9
    final = agreement(lab, ref)
    results["selected"] = {"threshold": args.vote_threshold, **final}
    print(f"\nFUSED: {json.dumps(final)}")

    if args.write_csv:
        os.makedirs(os.path.dirname(args.write_csv) or ".", exist_ok=True)
        with open(args.write_csv, "w") as f:
            f.write("id,prediction\n")
            for n in range(lab.shape[0]):
                for x in range(lab.shape[1]):
                    for y in range(lab.shape[2]):
                        f.write(f"{n + 1:03d}_{x * IMG_PATCH_SIZE}_"
                                f"{y * IMG_PATCH_SIZE},{int(lab[n, x, y])}\n")
        print(f"wrote {args.write_csv}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
