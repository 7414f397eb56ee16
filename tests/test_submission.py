"""Submission-CSV golden tests against a real reference submission.

Round-trip: parse a Kaggle CSV shipped with the reference
(``submissions/.../submission.csv``), paint the 16x16 blocks into masks,
run our on-device patchify/label/CSV writer, and require the output file
to be byte-identical (same id ordering — x-block outer, y inner — and
same labels). This pins the exact scan-order contract of
``images.py:232-236`` / ``extract_patches``.
"""

import os

import numpy as np
import pytest

from roadseg_tpu.constants import IMG_PATCH_SIZE
from roadseg_tpu.utils import images_io

GOLDEN = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation_"
          "stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
          "submission.csv")


def parse_csv(path):
    masks = {}
    with open(path) as f:
        assert f.readline().strip() == "id,prediction"
        for line in f:
            ident, label = line.strip().split(",")
            img, x, y = ident.split("_")
            masks.setdefault(int(img), {})[(int(x), int(y))] = int(label)
    return masks


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference submissions not mounted")
def test_csv_roundtrip_reference_golden(tmp_path):
    parsed = parse_csv(GOLDEN)
    num = max(parsed)
    size = (max(x for x, _ in parsed[1]) + IMG_PATCH_SIZE)
    assert (num, size) == (50, 608)

    masks = np.zeros((num, size, size, 1), np.float32)
    for img, blocks in parsed.items():
        for (x, y), label in blocks.items():
            masks[img - 1, y:y + IMG_PATCH_SIZE, x:x + IMG_PATCH_SIZE, 0] = \
                label

    out = images_io.save_submission_csv(masks, str(tmp_path), IMG_PATCH_SIZE)
    with open(out) as got, open(GOLDEN) as want:
        got_lines = got.read().strip().split("\n")
        want_lines = want.read().strip().split("\n")
    assert got_lines == want_lines


def test_csv_label_threshold(tmp_path):
    """A block whose road fraction is exactly at/below 0.25 labels 0, above
    labels 1 (labels_for_patches contract, ``images.py:88-99``)."""
    m = np.zeros((1, 32, 32, 1), np.float32)
    m[0, 0:8, 0:8, 0] = 1.0        # 64/256 = 0.25 -> not > 0.25 -> 0
    m[0, 16:26, 16:26, 0] = 1.0    # 100/256 ~ 0.39 -> 1
    out = images_io.save_submission_csv(m, str(tmp_path), 16)
    rows = dict(line.split(",") for line in
                open(out).read().strip().split("\n")[1:])
    assert rows["001_0_0"] == "0"
    assert rows["001_16_16"] == "1"


def test_compare_submissions_reference_pair():
    """Sanity of the scoring utility on two real reference submissions:
    the 94.124 and 93.994 runs should agree on the vast majority of
    patches but not all."""
    import glob
    from roadseg_tpu.utils.scoring import compare_submissions
    subs = sorted(glob.glob(
        "/root/reference/submissions/*/submission.csv"))
    if len(subs) < 2:
        pytest.skip("reference submissions not mounted")
    best = [s for s in subs if "94_124" in s][0]
    other = [s for s in subs if "93_994" in s][0]
    r = compare_submissions(other, best)
    assert r["total"] == 50 * 38 * 38
    assert 0.90 < r["agreement"] < 1.0
    assert 0.80 < r["f1_vs_ref"] < 1.0
