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

from typing import Dict


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
