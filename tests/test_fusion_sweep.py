"""scripts/fusion_sweep.py — fusion knob sweep + held-out selection rule.

Pins on synthetic data: (a) the sweep's fused-agreement arithmetic
matches a direct recomputation, (b) ``--select fraction`` picks the grid
point whose fused road fraction is closest to the target WITHOUT using
agreement, (c) ``--apply`` writes the selected knobs into fusion.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.utils import images_io, scoring

import fusion_sweep


def _setup(tmp_path):
    rng = np.random.default_rng(7)
    pps = 4  # 4x4 patches per 64px image
    n = 3
    win = (rng.uniform(size=(n, pps, pps)) < 0.3).astype(np.int8)
    win_dir = tmp_path / "winner"
    images_io.save_submission_csv(
        scoring.labels_to_mask(win, IMG_PATCH_SIZE), str(win_dir),
        IMG_PATCH_SIZE)

    cache = tmp_path / "cache"
    cache.mkdir()
    members = []
    for i, date in enumerate(("2026-01-01T00h00m00s", "2026-01-02T00h00m00s")):
        lab = win.copy()
        flips = rng.uniform(size=lab.shape) < 0.1 * (i + 1)
        lab = np.where(flips, 1 - lab, lab)
        masks = scoring.labels_to_mask(lab, IMG_PATCH_SIZE).astype(np.float32)
        np.save(cache / f"{date}_epoch{15 + i:03d}.npy", masks)
        members.append({"source_experiment": date, "source_epoch": 15 + i,
                        "checkpoint": f"{date}-epoch-{15 + i:03d}.chkpt"})
    (tmp_path / "release.json").write_text(json.dumps(
        {"members": members, "model": {}}))

    lab = np.where(rng.uniform(size=win.shape) < 0.08, 1 - win, win)
    csv_dir = tmp_path / "oldgen"
    images_io.save_submission_csv(
        scoring.labels_to_mask(lab, IMG_PATCH_SIZE), str(csv_dir),
        IMG_PATCH_SIZE)
    (tmp_path / "fusion.json").write_text(json.dumps({
        "csv_votes": [{"path": str(csv_dir / "submission.csv"),
                       "weight": 2.0}],
        "member_weight": 1.0, "vote_threshold": 0.5}))
    return win, win_dir


def test_sweep_and_fraction_selection(tmp_path):
    win, win_dir = _setup(tmp_path)
    out = tmp_path / "sweep.json"
    rc = fusion_sweep.main([
        "--release", str(tmp_path / "release.json"),
        "--fusion", str(tmp_path / "fusion.json"),
        "--cache", str(tmp_path / "cache"),
        "--winner", str(win_dir / "submission.csv"),
        "--member_weights", "0.5,1.0,2.0",
        "--thresholds", "0.3,0.5,0.7",
        "--select", "fraction", "--target_frac", str(float(win.mean())),
        "--apply", "--out", str(out)])
    assert rc == 0
    res = json.loads(out.read_text())
    grid = res["grid"]
    assert len(grid) == 9
    # (a) best-by-agreement is first; grid rows internally consistent
    assert res["best"]["agreement"] == max(r["agreement"] for r in grid)
    # (b) fraction rule: closest fused fraction to the target, agreement
    # not consulted
    target = float(win.mean())
    dmin = min(abs(r["road_frac"] - target) for r in grid)
    assert abs(res["fraction_matched"]["road_frac"] - target) == dmin
    assert res["fraction_matched"]["regret_vs_oracle"] == round(
        res["best"]["agreement"] - res["fraction_matched"]["agreement"], 5)
    # (c) --apply wrote the FRACTION-selected knobs (not the oracle's)
    spec = json.loads((tmp_path / "fusion.json").read_text())
    assert spec["member_weight"] == res["fraction_matched"]["member_weight"]
    assert spec["vote_threshold"] == res["fraction_matched"]["vote_threshold"]
    assert "selected by fraction" in spec["notes"]


def test_sweep_agreement_matches_direct_fusion(tmp_path):
    """One grid point recomputed by hand equals the sweep's row."""
    win, win_dir = _setup(tmp_path)
    out = tmp_path / "sweep.json"
    rc = fusion_sweep.main([
        "--release", str(tmp_path / "release.json"),
        "--fusion", str(tmp_path / "fusion.json"),
        "--cache", str(tmp_path / "cache"),
        "--winner", str(win_dir / "submission.csv"),
        "--member_weights", "1.0", "--thresholds", "0.5",
        "--out", str(out)])
    assert rc == 0
    row = json.loads(out.read_text())["grid"][0]

    member_votes = []
    for f in sorted((tmp_path / "cache").iterdir()):
        member_votes.append(scoring.mask_labels(
            np.load(f), IMG_PATCH_SIZE, FOREGROUND_THRESHOLD))
    csv_lab = scoring.submission_labels(
        str(tmp_path / "oldgen" / "submission.csv"), IMG_PATCH_SIZE)
    acc = np.sum(member_votes, axis=0).astype(np.float64) + 2.0 * csv_lab
    fused = acc / (1.0 * len(member_votes) + 2.0) > 0.5 - 1e-9
    assert row["agreement"] == round(float((fused == win).mean()), 5)
    assert row["road_frac"] == round(float(fused.mean()), 4)
