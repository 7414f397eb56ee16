"""The road-fraction analysis tool must quantize exactly like the
shipping pipeline (pixel 0.5, patch 0.25, 16 px grid, x-outer ids) —
otherwise its accept/reject verdicts on bias experiments are about a
different pipeline. Guard: its labels must round-trip bit-identically
through images_io.save_submission_csv (itself golden-tested byte-equal
to the reference 94.124 submission, reference src/mask_to_submission.py
semantics)."""

import csv
import importlib.util
import os
import sys

import numpy as np

from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io

_SPEC = importlib.util.spec_from_file_location(
    "road_fraction_by_member",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "road_fraction_by_member.py"),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_patch_labels_matches_submission_pipeline(tmp_path):
    rng = np.random.default_rng(7)
    masks = rng.random((3, 608, 608, 1)).astype(np.float32)

    labels = _MOD.patch_labels(masks)

    quant = geometry.quantize_mask(masks, 0.25, 16)
    images_io.save_submission_csv(np.asarray(quant), str(tmp_path), 16)
    csv_path = os.path.join(str(tmp_path), "submission.csv")
    with open(csv_path) as f:
        from_csv = {r["id"]: int(r["prediction"]) for r in csv.DictReader(f)}

    assert set(labels) == set(from_csv)
    mismatches = [k for k in labels if labels[k] != from_csv[k]]
    assert mismatches == []
