"""Oracle tests for the cross-generation patch-label fusion tool.

``scripts/label_fuse.py`` fuses archived submission CSVs (binary patch
votes) with cached probability masks (each converted to its own binary
patch decision through the production quantize semantics). These tests
pin (a) the CSV round-trip against the real writer
(``images_io.save_submission_csv``), (b) the per-mask vote against the
pipeline's quantize path, and (c) simple-majority arithmetic.

The fusion layer has no reference counterpart (the reference ensembles
logits inside one process, ``tf_aerial_images.py:458-476``); it exists
to recycle lineages whose weights were lost, so correctness rests on
these oracles.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import ensemble_search  # noqa: E402
import label_fuse  # noqa: E402

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io


def _write_csv(mask, tmp_path, name):
    """Quantize a prob mask and write it with the production writer."""
    out = str(tmp_path / name)
    q = np.asarray(geometry.quantize_mask(
        mask[..., None], threshold=FOREGROUND_THRESHOLD,
        patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(q, out, IMG_PATCH_SIZE)
    return os.path.join(out, "submission.csv")


def test_csv_roundtrip_matches_quantize(tmp_path):
    rng = np.random.default_rng(3)
    n, hw = 2, IMG_PATCH_SIZE * 4
    mask = rng.uniform(0.3, 0.7, size=(n, hw, hw)).astype(np.float32)
    path = _write_csv(mask, tmp_path, "m")

    lab = label_fuse.load_csv_labels(path)          # [n, x, y]
    # independent oracle: the search module's patch math
    pm = ensemble_search.patch_probs(mask, 4)       # [n, y, x]
    expect = (pm.transpose(0, 2, 1) > FOREGROUND_THRESHOLD)
    assert lab.shape == (n, 4, 4)
    np.testing.assert_array_equal(lab.astype(bool), expect)


def test_mask_member_votes_match_pipeline(tmp_path):
    rng = np.random.default_rng(5)
    n, hw = 2, IMG_PATCH_SIZE * 4
    cache = tmp_path / "cache"
    cache.mkdir()
    masks = rng.uniform(0.3, 0.7, size=(3, n, hw, hw)).astype(np.float32)
    for i in range(3):
        np.save(cache / f"m{i}.npy", masks[i][..., None])

    votes = label_fuse.mask_member_votes(str(cache), ["m0", "m1", "m2"])
    assert votes.shape == (3, n, 4, 4)
    for i in range(3):
        lab = label_fuse.load_csv_labels(
            _write_csv(masks[i], tmp_path, f"c{i}"))
        np.testing.assert_array_equal(votes[i].astype(bool),
                                      lab.astype(bool))


def test_majority_fusion_end_to_end(tmp_path):
    """3 CSV members, one disagreeing: majority must win every patch."""
    n, hw, pps = 1, IMG_PATCH_SIZE * 4, 4
    road = np.zeros((n, hw, hw), np.float32)
    road[:, :IMG_PATCH_SIZE, :] = 1.0           # first y-row of patches road
    nothing = np.zeros_like(road)

    paths = [_write_csv(m, tmp_path, f"v{i}")
             for i, m in enumerate([road, road, nothing])]
    ref_csv = _write_csv(road, tmp_path, "ref")

    out = tmp_path / "fuse.json"
    fused_csv = tmp_path / "fused" / "submission.csv"
    rc = label_fuse.main([
        "--csv", paths[0], "--csv", paths[1], "--csv", paths[2],
        "--ref", ref_csv, "--out", str(out),
        "--write_csv", str(fused_csv)])
    assert rc == 0

    import json
    res = json.loads(out.read_text())
    assert res["selected"]["agreement"] == 1.0   # 2-of-3 vote == road row

    # the written fused CSV parses back to the majority labels
    lab = label_fuse.load_csv_labels(str(fused_csv))
    expect = label_fuse.load_csv_labels(paths[0])
    np.testing.assert_array_equal(lab, expect)
