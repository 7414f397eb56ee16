"""The host-side ensemble subset scorer must match the real pipeline.

``scripts/ensemble_search.py`` re-scores member subsets in vectorized
NumPy so the search runs at ~0.1 s/subset instead of a full
quantize -> CSV -> compare round-trip. Its docstring claims equivalence
with ``geometry.quantize_mask`` + ``images_io.save_submission_csv`` +
``scoring.compare_submissions`` (the path ``scripts/ensemble_runs.py``
uses for the shipped artifact); this pins that equivalence on synthetic
masks, including values straddling the 0.5 pixel and
FOREGROUND_THRESHOLD patch boundaries.

Reference counterpart: the reference ensembles at logit level inside
one process (``tf_aerial_images.py:458-476``) and has no subset-search
tooling; the mask-cache search layer is ours, so it gets its own oracle
test.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import ensemble_search  # noqa: E402

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io
from roadseg_tpu.utils.scoring import compare_submissions


def _pipeline_score(mean_mask: np.ndarray, ref_mask: np.ndarray,
                    tmp_path) -> dict:
    """Score via the real artifact pipeline (the ensemble_runs.py path)."""
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    q_a = np.asarray(geometry.quantize_mask(
        mean_mask[..., None], threshold=FOREGROUND_THRESHOLD,
        patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(q_a, out_a, IMG_PATCH_SIZE)
    images_io.save_submission_csv(ref_mask[..., None], out_b, IMG_PATCH_SIZE)
    return compare_submissions(os.path.join(out_a, "submission.csv"),
                               os.path.join(out_b, "submission.csv"))


@pytest.fixture(scope="module")
def synthetic():
    rng = np.random.default_rng(7)
    n, hw = 3, IMG_PATCH_SIZE * 4  # 3 images, 4x4 patches each
    # Probabilities concentrated near the 0.5 pixel threshold so patch
    # fractions land on both sides of FOREGROUND_THRESHOLD.
    masks = rng.uniform(0.3, 0.7, size=(4, n, hw, hw)).astype(np.float32)
    ref_mask = (rng.uniform(size=(n, hw, hw)) < 0.3).astype(np.float32)
    return masks, ref_mask


def test_search_score_matches_pipeline(synthetic, tmp_path):
    masks, ref_mask = synthetic
    mean = masks.mean(axis=0)
    got = _pipeline_score(mean, ref_mask, tmp_path)

    # Reference labels the way the search loads them: via the written CSV.
    ref_csv = os.path.join(str(tmp_path), "b", "submission.csv")
    pps = ref_mask.shape[1] // IMG_PATCH_SIZE
    ref = ensemble_search.load_ref_labels(ref_csv, ref_mask.shape[0], pps)
    want = ensemble_search.score(mean, ref)

    for key in ("agreement", "f1_vs_ref", "road_frac_a", "road_frac_b"):
        assert want[key] == pytest.approx(got[key], abs=1e-12), key
    assert want["total"] == got["total"]


def test_load_ref_labels_roundtrip(synthetic, tmp_path):
    _, ref_mask = synthetic
    out = str(tmp_path / "rt")
    images_io.save_submission_csv(ref_mask[..., None], out, IMG_PATCH_SIZE)
    pps = ref_mask.shape[1] // IMG_PATCH_SIZE
    ref = ensemble_search.load_ref_labels(
        os.path.join(out, "submission.csv"), ref_mask.shape[0], pps)
    # ref is [img, x-block, y-block]; recompute directly from the mask.
    n = ref_mask.shape[0]
    p = IMG_PATCH_SIZE
    frac = ref_mask.reshape(n, pps, p, pps, p).mean(axis=(2, 4))  # [n, y, x]
    want = (frac.transpose(0, 2, 1) > FOREGROUND_THRESHOLD).astype(np.int8)
    np.testing.assert_array_equal(ref, want)


def test_subset_mean_binarization_order(synthetic):
    """Pixel binarization happens AFTER the member mean, not per member."""
    masks, ref_mask = synthetic
    pps = ref_mask.shape[1] // IMG_PATCH_SIZE
    mean = masks.mean(axis=0)
    pm = ensemble_search.patch_probs(mean, pps)
    # Averaging already-binarized members would give a different field.
    per_member = np.stack([(m >= 0.5).astype(np.float32) for m in masks])
    n, h, w = mean.shape
    p = IMG_PATCH_SIZE
    alt = per_member.mean(axis=0).reshape(n, pps, p, pps, p).mean(axis=(2, 4))
    assert not np.allclose(pm, alt)


def test_ensemble_runs_all_cached_scores_without_device(synthetic, tmp_path):
    """ensemble_runs.main() with every member cached is a pure host
    re-scoring pass: it must not need any checkpoint or TPU predict,
    and its parity.json must match the search scorer on the same mean."""
    import ensemble_runs

    masks, ref_mask = synthetic
    cache = tmp_path / "cache"
    cache.mkdir()
    members = []
    for i, m in enumerate(masks[:2]):
        np.save(cache / f"2020-01-01T00h00m0{i}s_epoch00{i}.npy",
                m[..., None])
        members += ["--member", f"2020-01-01T00h00m0{i}s:{i}"]
    ref_dir = str(tmp_path / "ref")
    images_io.save_submission_csv(ref_mask[..., None], ref_dir,
                                  IMG_PATCH_SIZE)
    out = str(tmp_path / "out")
    rc = ensemble_runs.main(members + [
        "--mask_cache", str(cache), "--out", out,
        "--ref", os.path.join(ref_dir, "submission.csv"),
        "--save_path", str(tmp_path / "no_runs")])
    assert rc == 0
    import json
    with open(os.path.join(out, "parity.json")) as f:
        got = json.load(f)
    pps = ref_mask.shape[1] // IMG_PATCH_SIZE
    ref = ensemble_search.load_ref_labels(
        os.path.join(ref_dir, "submission.csv"), ref_mask.shape[0], pps)
    want = ensemble_search.score(masks[:2].mean(axis=0), ref)
    assert got["agreement"] == pytest.approx(want["agreement"], abs=1e-12)


def test_ensemble_runs_skips_missing_members(synthetic, tmp_path):
    """A member whose checkpoint epoch doesn't exist (e.g. a lineage that
    resumed into a new run dir) is skipped with a note; the average and
    the recorded member list cover only the members actually used."""
    import json

    import ensemble_runs

    masks, ref_mask = synthetic
    cache = tmp_path / "cache"
    cache.mkdir()
    np.save(cache / "2020-01-01T00h00m00s_epoch000.npy", masks[0][..., None])
    ref_dir = str(tmp_path / "ref")
    images_io.save_submission_csv(ref_mask[..., None], ref_dir,
                                  IMG_PATCH_SIZE)
    out = str(tmp_path / "out")
    rc = ensemble_runs.main([
        "--member", "2020-01-01T00h00m00s:0",
        "--member", "2020-01-01T00h00m00s:7",   # no checkpoint, no cache
        "--mask_cache", str(cache), "--out", out,
        "--ref", os.path.join(ref_dir, "submission.csv"),
        "--save_path", str(tmp_path / "no_runs")])
    assert rc == 0
    with open(os.path.join(out, "parity.json")) as f:
        got = json.load(f)
    assert got["members"] == ["2020-01-01T00h00m00s:0"]
    pps = ref_mask.shape[1] // IMG_PATCH_SIZE
    ref = ensemble_search.load_ref_labels(
        os.path.join(ref_dir, "submission.csv"), ref_mask.shape[0], pps)
    want = ensemble_search.score(masks[0], ref)
    assert got["agreement"] == pytest.approx(want["agreement"], abs=1e-12)


def test_search_exclude_filters_full_image_members(synthetic, tmp_path):
    """`--exclude _full` must keep full-image-mode cache entries out of a
    release search: run.py reproduces releases with sliding-window
    inference only, so a `_full` member in the winning subset would make
    the release unreproducible (finalize_parity passes this flag)."""
    import json

    masks, ref_mask = synthetic
    cache = tmp_path / "cache"
    cache.mkdir()
    np.save(cache / "2020-01-01T00h00m00s_epoch000.npy", masks[0][..., None])
    np.save(cache / "2020-01-01T00h00m01s_epoch001.npy", masks[1][..., None])
    # A _full twin of the best member: excluded from the release search.
    np.save(cache / "2020-01-01T00h00m00s_epoch000_full.npy",
            masks[2][..., None])
    ref_dir = str(tmp_path / "ref")
    images_io.save_submission_csv(ref_mask[..., None], ref_dir,
                                  IMG_PATCH_SIZE)
    out = str(tmp_path / "search.json")
    rc = ensemble_search.main([
        "--cache", str(cache), "--max_k", "2", "--out", out,
        "--ref", os.path.join(ref_dir, "submission.csv"),
        "--exclude", "_full"])
    assert rc in (0, None)
    with open(out) as f:
        res = json.load(f)
    all_names = set(res["singles"]) | {
        m for v in res["best_by_k"].values() for m in v["members"]}
    assert all_names, "search saw no members"
    assert not any(n.endswith("_full") for n in all_names)
    # Without --exclude the _full member is searchable.
    rc = ensemble_search.main([
        "--cache", str(cache), "--max_k", "2", "--out", out,
        "--ref", os.path.join(ref_dir, "submission.csv")])
    assert rc in (0, None)
    with open(out) as f:
        res = json.load(f)
    assert any(n.endswith("_full") for n in res["singles"])


def test_threshold_sweep_baseline_matches_faithful_score(synthetic):
    """threshold_sweep at exactly (0.5, 0.25) must equal the faithful
    scorer — patch fractions are multiples of 1/(IMG_PATCH_SIZE^2), so a
    threshold like float64 0.24999999999999997 silently flips every
    exactly-64/256 patch (the bug the exact grid fixed)."""
    import threshold_sweep

    masks, ref_mask = synthetic
    mean = masks.mean(axis=0)
    # Force patch fractions to land exactly ON the 0.25 boundary: one
    # patch with exactly 25% road pixels.
    p = IMG_PATCH_SIZE
    mean[0, :p, :p] = 0.0
    mean[0, :p, : p // 4] = 1.0     # exactly 64 of 256 pixels road
    pps = mean.shape[1] // IMG_PATCH_SIZE
    labels = np.zeros((mean.shape[0], pps, pps), np.int8)
    want = ensemble_search.score(
        mean, labels)["agreement"]
    rows = threshold_sweep.sweep(mean, labels, [0.5], [0.25])
    assert rows[0]["agreement"] == pytest.approx(want, abs=1e-12)
    # The boundary patch must be NON-road under the faithful `> 0.25`.
    # The original bug came from np.arange's STRONG float64 scalars
    # (0.15 + 4*0.025 = 0.24999999999999997): a plain Python float would
    # weak-promote down to float32 0.25 and mask the flip (NEP 50).
    bad_t = np.arange(0.15, 0.451, 0.025)[4]
    assert float(bad_t) != 0.25
    bad = threshold_sweep.sweep(mean, labels, [0.5], [bad_t])
    assert bad[0]["agreement"] != rows[0]["agreement"]
