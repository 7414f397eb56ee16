#!/usr/bin/env python3
"""Threshold-calibration sweep over cached ensemble masks.

The reference quantization pipeline is pixel-binarize at 0.5 then
patch-road-fraction > FOREGROUND_THRESHOLD (0.25) (reference
``images.py:256-266``, ``constants.py``). Our ensembles systematically
over-predict road vs the 94.124 winner (road_frac 0.2527 vs 0.2474), so
this sweeps BOTH thresholds over the already-cached probability masks to
measure how much of the remaining disagreement is pure calibration.

Host-side only (NumPy over artifacts/mask_cache); results are recorded
as an artifact for an explicit wiring decision — the release pipeline
stays reference-faithful unless a calibrated variant is deliberately
shipped (and documented as a divergence).

Usage:
  python scripts/threshold_sweep.py [--members name1 name2 ...]
      [--out artifacts/threshold_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.constants import IMG_PATCH_SIZE
from scripts.ensemble_search import REF_BEST, load_ref_labels


def sweep(mean_mask: np.ndarray, ref: np.ndarray,
          pix_ts, patch_ts) -> list[dict]:
    pps = ref.shape[1]
    n, h, w = mean_mask.shape
    p = IMG_PATCH_SIZE
    refb = ref.astype(bool)
    rows = []
    for pix_t in pix_ts:
        binar = (mean_mask >= pix_t).astype(np.float32)
        frac = binar.reshape(n, pps, p, pps, p).mean(axis=(2, 4))
        fracx = frac.transpose(0, 2, 1)  # [n, x-block, y-block]
        for patch_t in patch_ts:
            lab = fracx > patch_t
            rows.append({
                "pix_t": round(float(pix_t), 3),
                "patch_t": round(float(patch_t), 6),
                "agreement": float((lab == refb).mean()),
                "road_frac": float(lab.mean()),
            })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="artifacts/mask_cache")
    ap.add_argument("--ref", default=REF_BEST)
    ap.add_argument("--members", nargs="*", default=None,
                    help="cache names (default: best subset from "
                         "artifacts/ensemble_search.json)")
    ap.add_argument("--out", default="artifacts/threshold_sweep.json")
    args = ap.parse_args(argv)

    members = args.members
    if not members:
        search = json.load(open("artifacts/ensemble_search.json"))
        members = max(search["best_by_k"].values(),
                      key=lambda v: v["agreement"])["members"]
    masks = np.stack([
        np.load(os.path.join(args.cache, m + ".npy")).squeeze(-1)
        .astype(np.float32) for m in members])
    mean = masks.mean(axis=0)
    ref = load_ref_labels(args.ref, mean.shape[0],
                          mean.shape[1] // IMG_PATCH_SIZE)

    # Exact grid values: patch road fractions are multiples of 1/256
    # (16x16 patches), so a threshold like float64 0.24999999999999997
    # silently flips every exactly-64/256 patch vs the faithful
    # ``> 0.25``. Round to exact decimals; additionally place patch
    # thresholds at half-steps between k/256 levels so each step moves
    # exactly one quantization level.
    pix_ts = [round(t, 3) for t in np.arange(0.40, 0.701, 0.025)]
    patch_ts = [k / 256 for k in range(38, 116)]  # exact in binary fp
    rows = sweep(mean, ref, pix_ts, patch_ts)
    rows.sort(key=lambda r: -r["agreement"])
    base = next(r for r in rows
                if abs(r["pix_t"] - 0.5) < 1e-6
                and abs(r["patch_t"] - 0.25) < 1e-6)
    out = {"members": members, "baseline_ref_faithful": base,
           "top10": rows[:10]}
    json.dump(out, open(args.out, "w"), indent=2)
    print(json.dumps({"baseline": base, "best": rows[0]}, indent=2))


if __name__ == "__main__":
    main()
