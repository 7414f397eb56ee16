#!/usr/bin/env python3
"""Host-side ensemble subset search over cached probability masks.

``scripts/ensemble_runs.py`` caches each member's 6-way-TTA probability
masks under ``artifacts/mask_cache``. Given those, choosing WHICH members
to average is pure host arithmetic: mean the masks, binarize at 0.5,
patch-average, threshold at FOREGROUND_THRESHOLD, compare with the
reference's winning submission (the same pipeline as
``geometry.quantize_mask`` + ``images_io.save_submission_csv`` +
``scoring.compare_submissions``, reimplemented in vectorized NumPy so a
subset scores in ~0.1 s instead of a TPU predict per member).

Search: score every single and pair, then greedy forward selection from
the best pair (with replacement disabled), reporting the best subset per
size. Validated against ensemble_runs.py's scored artifacts (identical
agreement for the same member set).

Usage:
  python scripts/ensemble_search.py [--cache artifacts/mask_cache]
      [--max_k 8] [--out artifacts/ensemble_search.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE

REF_BEST = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
            "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
            "submission.csv")


def load_ref_labels(path: str, num: int, pps: int) -> np.ndarray:
    """Reference submission CSV -> labels[img, x-block, y-block]."""
    ref = np.full((num, pps, pps), -1, np.int8)
    pat = re.compile(r"^(\d+)_(\d+)_(\d+),(\d)$")
    with open(path) as f:
        assert f.readline().strip() == "id,prediction"
        for line in f:
            m = pat.match(line.strip())
            n, x, y, label = (int(g) for g in m.groups())
            ref[n - 1, x // IMG_PATCH_SIZE, y // IMG_PATCH_SIZE] = label
    assert (ref >= 0).all(), "reference CSV has holes"
    return ref


def patch_probs(mean_mask: np.ndarray, pps: int) -> np.ndarray:
    """[N, H, W] mean prob -> per-patch road fraction [N, y-block, x-block].

    Pixel binarization at 0.5 happens BEFORE the patch mean — the exact
    ``geometry._quantize`` ordering (reference ``images.py:256-266``).
    """
    n, h, w = mean_mask.shape
    p = IMG_PATCH_SIZE
    binar = (mean_mask >= 0.5).astype(np.float32)
    return binar.reshape(n, pps, p, pps, p).mean(axis=(2, 4))


def _patch_probs_from_sum(sum_mask: np.ndarray, k: int,
                          pps: int) -> np.ndarray:
    """Patch road fractions of the k-member mean, computed from the
    members' SUM: mean >= 0.5  ⟺  sum >= 0.5*k (exact in f32 up to ulp
    ties, and the winning subset is re-scored through the real pipeline
    by finalize_parity anyway). Avoids re-averaging the full pixel
    stack for every candidate subset."""
    n, h, w = sum_mask.shape
    p = IMG_PATCH_SIZE
    binar = (sum_mask >= 0.5 * k).astype(np.float32)
    return binar.reshape(n, pps, p, pps, p).mean(axis=(2, 4))


def score(mean_mask: np.ndarray, ref: np.ndarray) -> dict:
    pps = ref.shape[1]
    pm = patch_probs(mean_mask, pps)          # [n, y-block, x-block]
    lab = (pm.transpose(0, 2, 1) > FOREGROUND_THRESHOLD)  # [n, x, y]
    refb = ref.astype(bool)
    tp = int((lab & refb).sum())
    tn = int((~lab & ~refb).sum())
    fp = int((lab & ~refb).sum())
    fn = int((~lab & refb).sum())
    total = lab.size
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {"agreement": (tp + tn) / total,
            "f1_vs_ref": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
            "road_frac_a": (tp + fp) / total,
            "road_frac_b": (tp + fn) / total, "total": total}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cache", default="artifacts/mask_cache")
    p.add_argument("--ref", default=REF_BEST)
    p.add_argument("--max_k", type=int, default=8)
    p.add_argument("--pair_top", type=int, default=24,
                   help="exhaustive pair search only among the top-N "
                        "singles (greedy expansion still considers every "
                        "member); keeps a 60+-member cache searchable in "
                        "minutes")
    p.add_argument("--out", default="artifacts/ensemble_search.json")
    p.add_argument("--exclude", default=None,
                   help="skip cache members whose name contains this "
                        "substring (e.g. '_full' to keep full-image-mode "
                        "masks out of a release search: run.py reproduces "
                        "releases with sliding-window inference only)")
    args = p.parse_args(argv)

    files = sorted(f for f in os.listdir(args.cache) if f.endswith(".npy")
                   and not (args.exclude and args.exclude in f))
    if not files:
        raise SystemExit(f"no cached masks in {args.cache}; run "
                         "scripts/ensemble_runs.py first")
    names = [f[:-4] for f in files]
    masks = np.stack([
        np.load(os.path.join(args.cache, f)).squeeze(-1).astype(np.float16)
        for f in files])                       # [m, N, H, W]
    m, num, h, w = masks.shape
    pps = h // IMG_PATCH_SIZE
    ref = load_ref_labels(args.ref, num, pps)
    print(f"{m} members, {num} images, {pps}x{pps} patches each")

    refb = ref.astype(bool)
    total = refb.size

    def sum_agreement(sum_mask, k):
        pm = _patch_probs_from_sum(sum_mask, k, pps)
        lab = pm.transpose(0, 2, 1) > FOREGROUND_THRESHOLD
        return float((lab == refb).mean())

    def subset_score(idx):
        return score(masks[list(idx)].mean(axis=0, dtype=np.float32), ref)

    results = {}
    singles = []
    for i in range(m):
        s = subset_score((i,))
        singles.append((s["agreement"], (i,)))
        print(f"  {names[i]}: {s['agreement']:.4f}")
    singles.sort(reverse=True)
    results["singles"] = {names[i[1][0]]: round(i[0], 5) for i in singles}

    best_by_k = {1: singles[0]}
    # exhaustive pairs among the strongest singles only (the running-sum
    # greedy below still sees every member at every k)
    top = [s[1][0] for s in singles[:args.pair_top]]
    pairs = []
    for i, j in itertools.combinations(top, 2):
        s = masks[i].astype(np.float32) + masks[j]
        pairs.append((sum_agreement(s, 2), (i, j)))
    pairs.sort(reverse=True)
    best_by_k[2] = pairs[0]

    # greedy forward selection from the best pair, over a running sum
    cur = list(pairs[0][1])
    cur_sum = masks[cur[0]].astype(np.float32) + masks[cur[1]]
    for k in range(3, min(args.max_k, m) + 1):
        cand = [(sum_agreement(cur_sum + masks[x], k), x)
                for x in range(m) if x not in cur]
        cand.sort(reverse=True)
        cur = cur + [cand[0][1]]
        cur_sum = cur_sum + masks[cand[0][1]]
        best_by_k[k] = (cand[0][0], tuple(cur))

    print("\nbest by ensemble size:")
    summary = {}
    for k, (agr, idx) in sorted(best_by_k.items()):
        mem = [names[i] for i in idx]
        print(f"  k={k}: {agr:.4f}  {mem}")
        summary[k] = {"agreement": round(agr, 5), "members": mem}
    results["best_by_k"] = summary

    best_k = max(best_by_k.items(), key=lambda kv: (kv[1][0], -kv[0]))
    idx = best_k[1][1]
    full = subset_score(idx)
    full["members"] = [names[i] for i in idx]
    results["best"] = full
    print(f"\nBEST: {json.dumps(full)}")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
