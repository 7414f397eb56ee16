"""End-to-end ``./run.py`` drive: ensemble release -> restore every
member -> predict -> mask average -> quantize -> submission CSV.

This is the shipped reproduction flow (reference ``run.py:121-177``);
the ensemble-average restore is ours (PARITY.md round 3), so it gets an
oracle: run.py's submission must equal averaging the members'
``predict_batchwise`` masks directly (ensemble_runs.py semantics).
"""

import json
import os
import sys

import jax
import numpy as np
import pytest
from PIL import Image

from roadseg_tpu.config import Options
from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY = dict(num_layers=2, root_size=4, patch_size=16, stride=16,
            batch_size=4, pred_batch_size=2, num_epoch=0,
            ensemble_prediction=True, dropout=1.0)
IMG = 2 * IMG_PATCH_SIZE  # 32px -> 2x2 Kaggle patches per image


@pytest.fixture()
def release_and_data(tmp_path):
    opts = Options(**TINY, seed=11, save_path=str(tmp_path / "runs"),
                   logdir=str(tmp_path / "logs"))
    eng = Engine(opts)
    eng.save(epoch=3)
    # perturb one conv kernel so the two members genuinely differ and
    # the averaged mask is not either member's
    eng.state["params"] = jax.tree.map(
        lambda x: x + 0.05 * np.sign(np.cos(np.arange(x.size))
                                     .reshape(x.shape)).astype(x.dtype),
        eng.state["params"])
    eng.save(epoch=4)

    from scripts import make_release
    rel = tmp_path / "release"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--member", f"{eng.experiment_name}:3",
        "--member", f"{eng.experiment_name}:4",
        "--score-json", '{"agreement": 0.5}',
        "--out", str(rel)])
    assert rc == 0

    data = tmp_path / "data"
    (data / "test").mkdir(parents=True)
    rng = np.random.RandomState(3)
    for i in range(2):
        arr = rng.randint(0, 256, size=(IMG, IMG, 3), dtype=np.uint8)
        Image.fromarray(arr).save(data / "test" / f"test_{i + 1}.png")
    return eng, rel, data, tmp_path


def test_run_main_reproduces_member_mask_average(release_and_data,
                                                 monkeypatch):
    eng, rel, data, tmp_path = release_and_data
    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(rel))
    monkeypatch.setattr(run_script, "SUBMISSION_CONFIG", dict(TINY))

    out = tmp_path / "out"
    rc = run_script.main(["--data", str(data), "--out", str(out),
                          "--save_path", str(tmp_path / "runs")])
    assert rc == 0
    csv = out / "submission.csv"
    lines = csv.read_text().strip().split("\n")
    assert lines[0] == "id,prediction"
    assert len(lines) == 1 + 2 * (IMG // IMG_PATCH_SIZE) ** 2
    assert (out / "images_001.png").exists()  # overlays land next to it

    # oracle: average the members' predict_batchwise masks directly
    imgs = images_io.load(str(data / "test"))
    meta = json.loads((rel / "release.json").read_text())
    acc = None
    for m in meta["members"]:
        eng.restore(file=str(rel / m["checkpoint"]))
        masks = np.asarray(eng.predict_batchwise(imgs, 2), np.float32)
        acc = masks if acc is None else acc + masks
    mean = acc / len(meta["members"])
    want = np.asarray(geometry.quantize_mask(
        mean, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(want, str(tmp_path / "oracle"),
                                  IMG_PATCH_SIZE)
    assert csv.read_text() == \
        (tmp_path / "oracle" / "submission.csv").read_text()


@pytest.mark.slow
def test_run_main_mixed_geometry_ensemble(tmp_path, monkeypatch):
    """An ensemble release whose members span architectures: run.py must
    rebuild its Engine per member geometry and still reproduce the
    direct mask average (the cross-architecture diversity case the
    subset search can select)."""
    opts_a = Options(**TINY, seed=11, save_path=str(tmp_path / "runs"),
                     logdir=str(tmp_path / "logs"))
    eng_a = Engine(opts_a)
    eng_a.save(epoch=3)
    tiny_b = dict(TINY, num_layers=3)
    opts_b = Options(**tiny_b, seed=12, save_path=str(tmp_path / "runs"),
                     logdir=str(tmp_path / "logs"))
    eng_b = Engine(opts_b)
    eng_b.save(epoch=5)

    from scripts import make_release
    rel = tmp_path / "release"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--member", f"{eng_a.experiment_name}:3",
        "--member", f"{eng_b.experiment_name}:5",
        "--out", str(rel)])
    assert rc == 0
    meta = json.loads((rel / "release.json").read_text())
    assert meta["members"][0]["model"]["num_layers"] == 2
    assert meta["members"][1]["model"]["num_layers"] == 3

    data = tmp_path / "data"
    (data / "test").mkdir(parents=True)
    rng = np.random.RandomState(5)
    for i in range(2):
        arr = rng.randint(0, 256, size=(IMG, IMG, 3), dtype=np.uint8)
        Image.fromarray(arr).save(data / "test" / f"test_{i + 1}.png")

    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(rel))
    monkeypatch.setattr(run_script, "SUBMISSION_CONFIG", dict(TINY))
    out = tmp_path / "out"
    rc = run_script.main(["--data", str(data), "--out", str(out),
                          "--save_path", str(tmp_path / "runs")])
    assert rc == 0

    imgs = images_io.load(str(data / "test"))
    acc = None
    for eng, m in ((eng_a, meta["members"][0]), (eng_b, meta["members"][1])):
        eng.restore(file=str(rel / m["checkpoint"]))
        masks = np.asarray(eng.predict_batchwise(imgs, 2), np.float32)
        acc = masks if acc is None else acc + masks
    want = np.asarray(geometry.quantize_mask(
        acc / 2, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(want, str(tmp_path / "oracle"),
                                  IMG_PATCH_SIZE)
    assert (out / "submission.csv").read_text() == \
        (tmp_path / "oracle" / "submission.csv").read_text()


def test_run_main_fuse_reproduces_label_vote(release_and_data, monkeypatch):
    """``./run.py --fuse``: the release members cast binary patch votes
    and the SHA-pinned archived CSVs in fusion.json vote with their
    weights; weighted majority (ties -> road) decides. Oracle: the same
    fusion computed directly from predict_batchwise masks + the CSV via
    roadseg_tpu.utils.scoring (label_fuse.py semantics)."""
    from roadseg_tpu.utils import scoring

    eng, rel, data, tmp_path = release_and_data
    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(rel))
    monkeypatch.setattr(run_script, "SUBMISSION_CONFIG", dict(TINY))

    # --fuse without a packaged fusion.json must refuse, not silently
    # fall back to the mask-mean ensemble.
    rc = run_script.main(["--data", str(data), "--out",
                          str(tmp_path / "nofuse"), "--fuse",
                          "--save_path", str(tmp_path / "runs")])
    assert rc == 1

    # A synthetic archived CSV vote: all-road on image 1, all-non-road
    # on image 2 (weight 2 vs two weight-1 members: the CSV dominates
    # ties wherever the members split).
    pps = IMG // IMG_PATCH_SIZE
    lab = np.zeros((2, pps, pps), np.int8)
    lab[0] = 1
    csv_dir = tmp_path / "oldgen"
    images_io.save_submission_csv(
        scoring.labels_to_mask(lab, IMG_PATCH_SIZE), str(csv_dir),
        IMG_PATCH_SIZE)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import make_fusion_spec
    rc = make_fusion_spec.main([
        "--csv", str(csv_dir / "submission.csv") + ":2",
        "--out", str(rel / "fusion.json")])
    assert rc == 0

    out = tmp_path / "out_fuse"
    rc = run_script.main(["--data", str(data), "--out", str(out), "--fuse",
                          "--save_path", str(tmp_path / "runs")])
    assert rc == 0

    # oracle fusion
    imgs = images_io.load(str(data / "test"))
    meta = json.loads((rel / "release.json").read_text())
    acc = np.zeros((2, pps, pps), np.float64)
    for m in meta["members"]:
        eng.restore(file=str(rel / m["checkpoint"]))
        masks = np.asarray(eng.predict_batchwise(imgs, 2), np.float32)
        acc += scoring.mask_labels(masks, IMG_PATCH_SIZE,
                                   FOREGROUND_THRESHOLD)
    acc += 2.0 * lab
    fused = (acc / 4.0) > 0.5 - 1e-9
    images_io.save_submission_csv(
        scoring.labels_to_mask(fused, IMG_PATCH_SIZE),
        str(tmp_path / "oracle_fuse"), IMG_PATCH_SIZE)
    got = (out / "submission.csv").read_text()
    assert got == (tmp_path / "oracle_fuse" / "submission.csv").read_text()
    # the dominating CSV vote must be visible in the output: image 1 has
    # road patches wherever members split, image 2 loses marginal ones
    got_lab = scoring.submission_labels(str(out / "submission.csv"),
                                        IMG_PATCH_SIZE)
    assert got_lab.shape == (2, pps, pps)


def test_run_main_dilated_release(release_and_data, monkeypatch):
    """``--dilated 1`` restores the packaged dilated release
    (artifacts/release_dilated — the reference run.py's pinned parity
    config, run.py:121-137) on a fresh clone with no runs/; a release
    whose geometry contradicts the explicit flag is skipped, not
    silently substituted."""
    eng, rel, data, tmp_path = release_and_data
    import run as run_script

    tiny_d = dict(TINY, dilated_layers=True)
    opts = Options(**tiny_d, seed=13, save_path=str(tmp_path / "runs_d"),
                   logdir=str(tmp_path / "logs"))
    eng_d = Engine(opts)
    eng_d.save(epoch=7)
    from scripts import make_release
    rel_d = tmp_path / "release_dilated"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs_d"),
        "--member", f"{eng_d.experiment_name}:7",
        "--out", str(rel_d)])
    assert rc == 0
    assert json.loads(
        (rel_d / "release.json").read_text())["model"]["dilated_layers"]

    monkeypatch.setattr(run_script, "RELEASE_DIR", str(rel))
    monkeypatch.setattr(run_script, "RELEASE_DIR_DILATED", str(rel_d))
    monkeypatch.setattr(run_script, "SUBMISSION_CONFIG", dict(TINY))
    out = tmp_path / "out_dilated"
    empty = tmp_path / "no_runs"  # fresh clone: no runs/ to fall back to
    rc = run_script.main(["--data", str(data), "--out", str(out),
                          "--dilated", "1", "--save_path", str(empty)])
    assert rc == 0
    # oracle: the dilated member's own prediction, quantized
    imgs = images_io.load(str(data / "test"))
    meta = json.loads((rel_d / "release.json").read_text())
    eng_d.restore(file=str(rel_d / meta["members"][0]["checkpoint"]))
    masks = np.asarray(eng_d.predict_batchwise(imgs, 2), np.float32)
    want = np.asarray(geometry.quantize_mask(
        masks, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(want, str(tmp_path / "oracle_dilated"),
                                  IMG_PATCH_SIZE)
    assert (out / "submission.csv").read_text() == \
        (tmp_path / "oracle_dilated" / "submission.csv").read_text()

    # a NON-dilated release in the dilated slot contradicts --dilated 1:
    # refused (no silent substitution), and with no runs/ there is no
    # fallback checkpoint either
    monkeypatch.setattr(run_script, "RELEASE_DIR_DILATED", str(rel))
    rc = run_script.main(["--data", str(data),
                          "--out", str(tmp_path / "out_bad"),
                          "--dilated", "1", "--save_path", str(empty)])
    assert rc == 1


def test_scoring_label_roundtrip(tmp_path):
    """labels -> block mask -> CSV -> labels is the identity, and
    mask_labels inverts labels_to_mask on binary input (pins the
    x=W / y=H orientation contract)."""
    from roadseg_tpu.utils import scoring

    rng = np.random.default_rng(3)
    lab = (rng.uniform(size=(3, 4, 4)) < 0.4).astype(np.int8)
    mask = scoring.labels_to_mask(lab, IMG_PATCH_SIZE)
    assert mask.shape == (3, 64, 64, 1)
    back = scoring.mask_labels(mask, IMG_PATCH_SIZE, FOREGROUND_THRESHOLD)
    assert (back == lab).all()
    images_io.save_submission_csv(mask, str(tmp_path), IMG_PATCH_SIZE)
    parsed = scoring.submission_labels(
        str(tmp_path / "submission.csv"), IMG_PATCH_SIZE)
    assert (parsed == lab).all()


def test_run_main_npz_only_release(release_and_data, monkeypatch):
    """Fresh-clone simulation (ADVICE r3 medium item): a clone gets ONLY
    the git-committable npz weight files — every Orbax member dir is
    gone. ./run.py must restore all members from npz and produce exactly
    the submission that direct npz restores + mask averaging produce."""
    import shutil
    eng, rel, data, tmp_path = release_and_data
    from scripts import make_release
    meta0 = json.loads((rel / "release.json").read_text())
    # re-package with npz for every member, then wipe the Orbax payloads
    rel2 = tmp_path / "release_npz"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--member", f"{meta0['members'][0]['source_experiment']}:3",
        "--member", f"{meta0['members'][0]['source_experiment']}:4",
        "--npz", "99", "--npz_dtype", "float16",
        "--out", str(rel2)])
    assert rc == 0
    meta = json.loads((rel2 / "release.json").read_text())
    # oracle from the npz files themselves (fp16 payload != fp32 Orbax)
    acc = None
    imgs = images_io.load(str(data / "test"))
    for m in meta["members"]:
        eng.restore(file=str(rel2 / m["npz"]))
        masks = np.asarray(eng.predict_batchwise(imgs, 2), np.float32)
        acc = masks if acc is None else acc + masks
    mean = acc / len(meta["members"])
    want = np.asarray(geometry.quantize_mask(
        mean, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    images_io.save_submission_csv(want, str(tmp_path / "oracle_npz"),
                                  IMG_PATCH_SIZE)

    for m in meta["members"]:
        shutil.rmtree(rel2 / m["checkpoint"])  # the fresh clone has no Orbax

    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(rel2))
    monkeypatch.setattr(run_script, "SUBMISSION_CONFIG", dict(TINY))
    out = tmp_path / "out_npz"
    rc = run_script.main(["--data", str(data), "--out", str(out),
                          "--save_path", str(tmp_path / "runs")])
    assert rc == 0
    assert (out / "submission.csv").read_text() == \
        (tmp_path / "oracle_npz" / "submission.csv").read_text()
