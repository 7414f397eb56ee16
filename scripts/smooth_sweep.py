#!/usr/bin/env python3
"""Spatial-smoothing sweep over cached ensemble probability masks.

PARITY.md round 3 localizes the residual disagreement with the
reference's winning submission: 53% of disagreeing patches have a
TTA-averaged road fraction within +-0.1 of the 0.25 decision threshold
— coin-flip patches, diffuse noise rather than structural error. Member
averaging shrinks that variance; spatial smoothing is the orthogonal
lever (roads are spatially continuous, so pooling neighboring evidence
de-noises marginal patches without moving confident ones).

This is a pure host-side sweep over the mask cache (no TPU):

  * pixel-level: Gaussian-blur the ensemble-mean probability mask with
    sigma in --sigmas before the 0.5 binarize (the reference pipeline's
    first threshold, ``images.py:256-266``);
  * patch-level: blur the 38x38 per-patch road-fraction map before the
    0.25 threshold (``images.py:88-99`` semantics), Gaussian or a 3x3
    box.

If a setting beats the unsmoothed ensemble, wire it as an explicit
post-processing option in the production quantize path; until then this
is a measurement tool only.

Usage:
  python scripts/smooth_sweep.py [--cache artifacts/mask_cache]
      [--members name1,name2,...]   # default: best subset from
                                    # artifacts/ensemble_search.json,
                                    # falling back to ALL cached masks
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE

import ensemble_search


def pixel_smooth_score(mean_mask, ref, sigma):
    if sigma > 0:
        mean_mask = ndimage.gaussian_filter(
            mean_mask, sigma=(0, sigma, sigma), mode="nearest")
    return ensemble_search.score(mean_mask, ref)


def patch_smooth_score(mean_mask, ref, sigma, box=False):
    """Blur the per-patch road-fraction map before the 0.25 threshold."""
    pps = ref.shape[1]
    pm = ensemble_search.patch_probs(mean_mask, pps)  # [n, y, x]
    if box:
        pm = ndimage.uniform_filter(pm, size=(1, 3, 3), mode="nearest")
    elif sigma > 0:
        pm = ndimage.gaussian_filter(pm, sigma=(0, sigma, sigma),
                                     mode="nearest")
    lab = pm.transpose(0, 2, 1) > FOREGROUND_THRESHOLD
    refb = ref.astype(bool)
    agree = (lab == refb).mean()
    return {"agreement": float(agree),
            "road_frac_a": float(lab.mean()), "road_frac_b": float(refb.mean())}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cache", default="artifacts/mask_cache")
    p.add_argument("--ref", default=ensemble_search.REF_BEST)
    p.add_argument("--members", default=None,
                   help="comma-separated cache basenames (no .npy); default "
                        "= best subset in artifacts/ensemble_search.json, "
                        "else all cached masks")
    p.add_argument("--search_json", default="artifacts/ensemble_search.json")
    p.add_argument("--sigmas", default="0,0.5,1,1.5,2,3,4,6,8")
    p.add_argument("--patch_sigmas", default="0,0.3,0.5,0.7,1,1.5")
    p.add_argument("--out", default="artifacts/smooth_sweep.json")
    args = p.parse_args(argv)

    if args.members:
        names = args.members.split(",")
    elif os.path.exists(args.search_json):
        with open(args.search_json) as f:
            search = json.load(f)
        _, best = max(search["best_by_k"].items(),
                      key=lambda kv: kv[1]["agreement"])
        names = best["members"]
        print(f"using best search subset ({len(names)} members)")
    else:
        names = sorted(f[:-4] for f in os.listdir(args.cache)
                       if f.endswith(".npy"))
        print(f"no search json; using all {len(names)} cached masks")

    masks = np.stack([
        np.load(os.path.join(args.cache, n + ".npy"))
        .squeeze(-1).astype(np.float32) for n in names])
    mean = masks.mean(axis=0)
    num, h, _ = mean.shape
    ref = ensemble_search.load_ref_labels(args.ref, num,
                                          h // IMG_PATCH_SIZE)

    results = {"members": names, "pixel": {}, "patch": {}, "patch_box": None}
    print("== pixel-level Gaussian on the mean probability mask")
    for s in (float(x) for x in args.sigmas.split(",")):
        r = pixel_smooth_score(mean, ref, s)
        results["pixel"][str(s)] = round(r["agreement"], 5)
        print(f"  sigma={s:>4}: agreement {r['agreement']:.5f} "
              f"road_frac {r['road_frac_a']:.4f}")

    print("== patch-level Gaussian on the 38x38 road-fraction map")
    for s in (float(x) for x in args.patch_sigmas.split(",")):
        r = patch_smooth_score(mean, ref, s)
        results["patch"][str(s)] = round(r["agreement"], 5)
        print(f"  sigma={s:>4}: agreement {r['agreement']:.5f} "
              f"road_frac {r['road_frac_a']:.4f}")

    r = patch_smooth_score(mean, ref, 0, box=True)
    results["patch_box"] = round(r["agreement"], 5)
    print(f"== patch-level 3x3 box: agreement {r['agreement']:.5f}")

    base = results["pixel"].get("0.0", results["pixel"].get("0"))
    best_kind, best_key, best_val = max(
        [("pixel", k, v) for k, v in results["pixel"].items()]
        + [("patch", k, v) for k, v in results["patch"].items()]
        + [("patch_box", "3x3", results["patch_box"])],
        key=lambda t: t[2])
    results["baseline"] = base
    results["best"] = {"kind": best_kind, "param": best_key,
                       "agreement": best_val,
                       "delta_vs_unsmoothed": round(best_val - base, 5)}
    print(f"\nBEST: {json.dumps(results['best'])}")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
