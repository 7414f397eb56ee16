"""Submission scoring utilities.

The reference validated through Kaggle's hidden test labels (scores encoded
in ``submissions/`` directory names, e.g. 94.124). Without the server, two
measurements stand in:

* ``compare_submissions`` — patch-level agreement / F1 between two
  submission CSVs over the same test set (e.g. ours vs the reference's
  winning 94.124 submission). Two models that both score ~94 on Kaggle
  agree on ~95+% of patches, so high agreement with the winner is a strong
  parity proxy.
* ``patch_scores`` (``utils/summary.py``) — patch F1 against groundtruth
  on a held-out training split.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def read_submission(path: str) -> Dict[str, int]:
    """Parse ``id,prediction`` rows into {patch_id: label}."""
    out = {}
    with open(path) as f:
        header = f.readline().strip()
        if header != "id,prediction":
            raise ValueError(f"bad header in {path}: {header}")
        for line in f:
            ident, label = line.strip().split(",")
            out[ident] = int(label)
    return out


def compare_submissions(path_a: str, path_b: str) -> Dict[str, float]:
    """Agreement stats between two submission CSVs (b = reference)."""
    a, b = read_submission(path_a), read_submission(path_b)
    if set(a) != set(b):
        raise ValueError(
            f"patch id sets differ: {len(a)} vs {len(b)} rows, "
            f"{len(set(a) ^ set(b))} mismatched ids")
    tp = sum(1 for k in a if a[k] == 1 and b[k] == 1)
    tn = sum(1 for k in a if a[k] == 0 and b[k] == 0)
    fp = sum(1 for k in a if a[k] == 1 and b[k] == 0)
    fn = sum(1 for k in a if a[k] == 0 and b[k] == 1)
    total = len(a)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"agreement": (tp + tn) / total, "f1_vs_ref": f1,
            "road_frac_a": (tp + fp) / total, "road_frac_b": (tp + fn) / total,
            "total": total}


# ---------------------------------------------------------------------------
# Patch-label vote arithmetic (cross-generation fusion, run.py --fuse).
#
# Coordinate convention, pinned by test probes against
# ``images_io.save_submission_csv`` (reference ``images.py:232-236``):
# CSV ids are ``{img:03d}_{x}_{y}`` with x = the image's W axis and
# y = the H axis, x-block outer / y-block inner in row order.
# Label arrays here are ``[img, x-block, y-block]`` (int8).
# ---------------------------------------------------------------------------

_ROW = re.compile(r"^(\d+)_(\d+)_(\d+),(\d)$")


def submission_labels(path: str, patch_size: int) -> np.ndarray:
    """Parse a submission CSV into labels ``[img, x-block, y-block]``,
    geometry (image count, blocks per side) inferred from the ids."""
    rows = []
    with open(path) as f:
        header = f.readline().strip()
        if header != "id,prediction":
            raise ValueError(f"bad header in {path}: {header}")
        for line in f:
            m = _ROW.match(line.strip())
            if not m:
                raise ValueError(f"bad row in {path}: {line!r}")
            n, x, y, label = (int(g) for g in m.groups())
            rows.append((n, x // patch_size, y // patch_size, label))
    num = max(r[0] for r in rows)
    pps = max(r[1] for r in rows) + 1
    lab = np.full((num, pps, pps), -1, np.int8)
    for n, x, y, label in rows:
        lab[n - 1, x, y] = label
    if (lab < 0).any():
        raise ValueError(f"{path} is missing patch rows")
    return lab


def mask_labels(masks: np.ndarray, patch_size: int,
                threshold: float) -> np.ndarray:
    """Probability masks ``[N, H, W(, 1)]`` -> patch labels
    ``[img, x-block, y-block]`` via the faithful quantize pipeline:
    pixel binarize at 0.5, then patch road fraction > ``threshold``
    (reference ``images.py:256-266`` + ``:88-99``)."""
    masks = np.asarray(masks)
    if masks.ndim == 4:
        masks = masks[..., 0]
    n, h, w = masks.shape
    p = patch_size
    binar = (masks >= 0.5).astype(np.float32)
    frac = binar.reshape(n, h // p, p, w // p, p).mean(axis=(2, 4))
    return (frac.transpose(0, 2, 1) > threshold).astype(np.int8)


def labels_to_mask(labels: np.ndarray, patch_size: int) -> np.ndarray:
    """Patch labels ``[img, x-block, y-block]`` -> block-constant binary
    mask ``[N, H, W, 1]`` (the inverse of ``mask_labels`` on binary
    input; feeds overlays and ``save_submission_csv``)."""
    labels = np.asarray(labels)
    hw = labels.transpose(0, 2, 1).astype(np.float32)  # [n, y, x]
    mask = np.repeat(np.repeat(hw, patch_size, axis=1), patch_size, axis=2)
    return mask[..., None]
