"""Release packaging flow: make_release.py + run.py's verified restore
preference (reference ``run.py:46-119`` distribute-and-verify parity)."""

import json
import os
import sys

import numpy as np
import pytest

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def tiny_run(tmp_path):
    opts = Options(num_layers=2, root_size=4, patch_size=16, stride=16,
                   batch_size=4, num_epoch=0, seed=11,
                   save_path=str(tmp_path / "runs"),
                   logdir=str(tmp_path / "logs"))
    eng = Engine(opts)
    eng.save(epoch=3)
    return eng, tmp_path


def test_make_release_and_run_preference(tiny_run, monkeypatch):
    eng, tmp_path = tiny_run
    from scripts import make_release
    out = tmp_path / "release"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--date", eng.experiment_name, "--epoch", "3",
        "--layers", "2", "--root_size", "4", "--dilated", "0",
        "--score-json", '{"agreement": 0.97}',
        "--out", str(out)])
    assert rc == 0
    meta = json.loads((out / "release.json").read_text())
    assert meta["source_epoch"] == 3
    assert meta["model"] == {"num_layers": 2, "root_size": 4,
                             "dilated_layers": False}
    assert (out / meta["checkpoint"] / "SHA256SUMS").exists()

    # a second release replaces the packaged checkpoint
    eng.save(epoch=4)
    make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--date", eng.experiment_name, "--epoch", "4",
        "--layers", "2", "--root_size", "4", "--dilated", "0",
        "--out", str(out)])
    ckpts = [d for d in os.listdir(out) if d.endswith(".chkpt")]
    assert ckpts == ["model-epoch-004.chkpt"]

    # run.py prefers the verified release and adopts its geometry
    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(out))
    ckpts2, meta2 = run_script.release_checkpoint()
    (ckpt,) = ckpts2
    assert ckpt.endswith("model-epoch-004.chkpt")
    assert meta2["model"]["num_layers"] == 2

    # corrupt the payload: restore still proceeds but warns (non-fatal,
    # matching the reference's sha check); verify_manifest flags it
    from roadseg_tpu.utils.checkpoint import verify_manifest
    victim = next(
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
        if f not in ("SHA256SUMS", "geometry.json"))
    with open(victim, "ab") as f:
        f.write(b"x")
    assert verify_manifest(ckpt) is False
    ckpts3, _ = run_script.release_checkpoint()
    assert ckpts3 == [ckpt]  # still returned — caller warns, not crashes


def test_make_ensemble_release(tiny_run, monkeypatch):
    """--member DATE:EPOCH x N packages every member; run.py returns the
    full member list for mask averaging (PARITY.md round 3)."""
    eng, tmp_path = tiny_run
    eng.save(epoch=4)
    from scripts import make_release
    out = tmp_path / "release"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--member", f"{eng.experiment_name}:3",
        "--member", f"{eng.experiment_name}:4",
        "--layers", "2", "--root_size", "4", "--dilated", "0",
        "--score-json", '{"agreement": 0.9718}',
        "--out", str(out)])
    assert rc == 0
    meta = json.loads((out / "release.json").read_text())
    assert len(meta["members"]) == 2
    names = [m["checkpoint"] for m in meta["members"]]
    assert names == [f"{eng.experiment_name}-epoch-003.chkpt",
                     f"{eng.experiment_name}-epoch-004.chkpt"]
    for name in names:
        assert (out / name / "SHA256SUMS").exists()

    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(out))
    ckpts, meta2 = run_script.release_checkpoint()
    assert [os.path.basename(c) for c in ckpts] == names
    assert meta2["model"]["dilated_layers"] is False

    # the restored members are loadable Engine checkpoints
    eng.restore(file=ckpts[1])


def test_member_and_date_are_exclusive(tiny_run):
    eng, tmp_path = tiny_run
    from scripts import make_release
    with pytest.raises(SystemExit, match="exclusive"):
        make_release.main([
            "--save_path", str(tmp_path / "runs"),
            "--date", eng.experiment_name, "--epoch", "3",
            "--member", f"{eng.experiment_name}:3",
            "--out", str(tmp_path / "r")])


def test_release_refuses_corrupt_source(tiny_run):
    eng, tmp_path = tiny_run
    from scripts import make_release
    src = eng._checkpointer.resolve(date=eng.experiment_name, epoch=3)
    victim = next(
        os.path.join(r, f) for r, _, fs in os.walk(src) for f in fs
        if f not in ("SHA256SUMS", "geometry.json"))
    with open(victim, "ab") as f:
        f.write(b"x")
    with pytest.raises(SystemExit, match="manifest mismatch"):
        make_release.main([
            "--save_path", str(tmp_path / "runs"),
            "--date", eng.experiment_name, "--epoch", "3",
            "--out", str(tmp_path / "release2")])


def test_npz_export_restore_roundtrip(tiny_run, monkeypatch):
    """--npz N exports git-committable fp16 weights; restore survives the
    Orbax payload being wiped (fresh machine / fresh clone — the repo's
    only weight-distribution channel, reference run.py:46-119)."""
    import shutil

    import jax

    from roadseg_tpu.utils import checkpoint as ckpt_lib
    eng, tmp_path = tiny_run
    orig_params = jax.device_get(eng.state["params"])
    from scripts import make_release
    out = tmp_path / "release"
    rc = make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--date", eng.experiment_name, "--epoch", "3",
        "--layers", "2", "--root_size", "4", "--dilated", "0",
        "--npz", "1", "--out", str(out)])
    assert rc == 0
    meta = json.loads((out / "release.json").read_text())
    m = meta["members"][0]
    assert m["npz"] == m["checkpoint"] + ".npz"
    npz_path = out / m["npz"]
    assert npz_path.exists() and m["npz_sha256"]
    assert ckpt_lib.read_geometry(str(npz_path)) == {
        "num_layers": 2, "root_size": 4, "dilated_layers": False}

    # wipe the Orbax payload: the npz takes over
    shutil.rmtree(out / m["checkpoint"])
    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(out))
    ckpts, meta2 = run_script.release_checkpoint()
    assert ckpts == [str(npz_path)]

    eng.state["params"] = jax.tree.map(lambda x: x * 0, eng.state["params"])
    eng.restore(file=str(npz_path))
    got = jax.device_get(eng.state["params"])
    for kp, leaf in jax.tree_util.tree_flatten_with_path(orig_params)[0]:
        back = got
        for k in kp:
            back = back[k.key]
        np.testing.assert_allclose(np.asarray(back), np.asarray(leaf),
                                   rtol=2e-3, atol=2e-4)


def test_npz_geometry_mismatch_is_caught(tiny_run, tmp_path_factory):
    """Engine.restore refuses an npz of the wrong architecture with the
    one-line geometry error, not a tree-structure dump."""
    eng, tmp_path = tiny_run
    import jax

    from roadseg_tpu.utils.checkpoint import export_npz
    npz = str(tmp_path / "w.npz")
    export_npz(jax.device_get(eng.state), npz,
               geometry={"num_layers": 3, "root_size": 8,
                         "dilated_layers": True})
    with pytest.raises(ValueError, match="3L root8 dilated"):
        eng.restore(file=npz)


def test_release_skips_missing_member(tiny_run, monkeypatch, capsys):
    """A partially-present ensemble release degrades to the members on
    disk instead of refusing outright (round-3 machine-reset lesson)."""
    import shutil
    eng, tmp_path = tiny_run
    eng.save(epoch=4)
    from scripts import make_release
    out = tmp_path / "release"
    make_release.main([
        "--save_path", str(tmp_path / "runs"),
        "--member", f"{eng.experiment_name}:3",
        "--member", f"{eng.experiment_name}:4",
        "--layers", "2", "--root_size", "4", "--dilated", "0",
        "--out", str(out)])
    meta = json.loads((out / "release.json").read_text())
    shutil.rmtree(out / meta["members"][0]["checkpoint"])
    import run as run_script
    monkeypatch.setattr(run_script, "RELEASE_DIR", str(out))
    ckpts, _ = run_script.release_checkpoint()
    assert [os.path.basename(c) for c in ckpts] == [
        meta["members"][1]["checkpoint"]]
    # and with every member gone, it falls back cleanly
    shutil.rmtree(out / meta["members"][1]["checkpoint"])
    ckpts2, meta2 = run_script.release_checkpoint()
    assert (ckpts2, meta2) == (None, None)


def test_npz_int8_quantized_roundtrip(tiny_run):
    """int8 per-tensor export (quarter-size git blob for the 124M-param
    flagship) dequantizes within ~0.5% of each tensor's max."""
    import jax

    from roadseg_tpu.utils.checkpoint import export_npz, restore_npz
    eng, tmp_path = tiny_run
    state = jax.device_get(eng.state)
    npz = str(tmp_path / "w8.npz")
    export_npz(state, npz, geometry=eng.model_geometry, dtype="int8")
    got = restore_npz({"params": state["params"]}, npz)
    for kp, leaf in jax.tree_util.tree_flatten_with_path(
            state["params"])[0]:
        back = got["params"]
        for k in kp:
            back = back[k.key]
        a = np.asarray(leaf, np.float32)
        tol = float(np.max(np.abs(a))) / 127.0 * 0.5 + 1e-8
        assert np.max(np.abs(np.asarray(back, np.float32) - a)) <= tol
        assert back.dtype == np.asarray(leaf).dtype


def test_rematerialize_npz_rebuilds_orbax_member(tiny_run):
    """rematerialize_npz.py re-hydrates a git-committed npz into
    runs/<date>/model-epoch-NNN.chkpt so DATE:EPOCH tooling (SWA,
    ensemble_runs, the release packager) can use a lineage whose Orbax
    payload was destroyed (three VM resets so far)."""
    import jax

    from roadseg_tpu.utils.checkpoint import (Checkpointer, export_npz,
                                              read_geometry)
    from scripts import rematerialize_npz
    eng, tmp_path = tiny_run
    geo = {"num_layers": 2, "root_size": 4, "dilated_layers": False}
    npz = str(tmp_path / "2020-01-01T00h00m00s-epoch-007.chkpt.npz")
    export_npz(jax.device_get(
        {"step": eng.state["step"], "params": eng.state["params"]}),
        npz, geometry=geo)

    save_path = str(tmp_path / "runs")
    rc = rematerialize_npz.main([npz, "--save_path", save_path])
    assert rc == 0
    out = os.path.join(save_path, "2020-01-01T00h00m00s",
                       "model-epoch-007.chkpt")
    assert os.path.isdir(out)
    assert read_geometry(out) == geo

    # idempotent: a second run is a no-op, not a re-save
    assert rematerialize_npz.main([npz, "--save_path", save_path]) == 0

    # the re-hydrated member restores to the npz params (fp16 tolerance)
    orig = jax.device_get(eng.state["params"])
    template = jax.device_get(eng.state)
    got = Checkpointer(save_path, "2020-01-01T00h00m00s").restore(
        template, file=out)["params"]
    for kp, leaf in jax.tree_util.tree_flatten_with_path(orig)[0]:
        back = got
        for k in kp:
            back = back[k.key]
        np.testing.assert_allclose(np.asarray(back), np.asarray(leaf),
                                   rtol=2e-3, atol=2e-4)
