#!/usr/bin/env python
"""Per-member road-fraction + winner-agreement table over the mask cache.

The round-2/3 diagnosis (PARITY.md): our models predict ~1% more road
than the 94.124 winner (road_frac ~0.2495-0.2527 vs 0.2474), worth an
estimated 0.3-0.5% agreement via the marginal-patch analysis. Round 4
trains a treatment arm (--class_weight_road 0.9, reference counterpart:
the unweighted softmax CE in tf_aerial_images.py:471-478 has no such
knob) — this script is the measurement instrument: it quantizes every
cached probability mask through the exact reference pipeline thresholds
(pixel 0.5, patch 0.25 — constants.py / SURVEY §2.13) and reports, per
member and per lineage, the submission-level road fraction and patch
agreement vs the winner CSV, so the class-weight arm can be accepted or
rejected on numbers.

CPU-only (reads cached masks; no TPU). Usage:
    python scripts/road_fraction_by_member.py [--cache artifacts/mask_cache]
"""
from __future__ import annotations

import argparse
import collections
import csv
import glob
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINNER = (
    "/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
    "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
    "submission.csv"
)


def winner_labels() -> dict:
    with open(WINNER) as f:
        return {r["id"]: int(r["prediction"]) for r in csv.DictReader(f)}


def patch_labels(masks: np.ndarray) -> dict:
    """Reference quantization: pixel binarize at 0.5, patch road
    fraction at 0.25, 16 px grid, id format NNN_x_y with x outer
    (images_io.save_submission_csv contract, golden-tested)."""
    out = {}
    n, h, w, _ = masks.shape
    binar = (masks[..., 0] > 0.5).astype(np.float32)
    for i in range(n):
        for x in range(0, w, 16):
            for y in range(0, h, 16):
                frac = binar[i, y : y + 16, x : x + 16].mean()
                out[f"{i + 1:03d}_{x}_{y}"] = int(frac > 0.25)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="artifacts/mask_cache")
    ap.add_argument("--out", default="artifacts/road_fraction_by_member.json")
    args = ap.parse_args()

    ref = winner_labels()
    rows = []
    for path in sorted(glob.glob(os.path.join(args.cache, "*.npy"))):
        name = os.path.basename(path)[: -len(".npy")]
        masks = np.load(path)
        labels = patch_labels(masks)
        common = set(labels) & set(ref)
        agree = sum(labels[k] == ref[k] for k in common) / len(common)
        frac = sum(labels.values()) / len(labels)
        lineage = name.split("_epoch")[0]
        rows.append(
            {
                "member": name,
                "lineage": lineage,
                "road_frac": round(frac, 5),
                "agreement": round(agree, 5),
            }
        )
        print(f"{name}: road_frac={frac:.4f} agreement={agree:.5f}")

    by_lineage = collections.defaultdict(list)
    for r in rows:
        by_lineage[r["lineage"]].append(r)
    summary = {}
    for lin, rs in sorted(by_lineage.items()):
        fr = [r["road_frac"] for r in rs]
        ag = [r["agreement"] for r in rs]
        summary[lin] = {
            "members": len(rs),
            "road_frac_median": round(float(np.median(fr)), 5),
            "road_frac_range": [round(min(fr), 5), round(max(fr), 5)],
            "agreement_median": round(float(np.median(ag)), 5),
            "agreement_best": round(max(ag), 5),
        }
        print(f"[{lin}] n={len(rs)} road_frac median {summary[lin]['road_frac_median']}"
              f" range {summary[lin]['road_frac_range']}"
              f" agree median {summary[lin]['agreement_median']}")
    result = {"winner_road_frac": round(sum(ref.values()) / len(ref), 5),
              "members": rows, "lineages": summary}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"winner road_frac: {result['winner_road_frac']}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
