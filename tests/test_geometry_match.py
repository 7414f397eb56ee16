"""Checkpoint <-> model architecture matching.

Round-2 regression: the auto-pickers in ``run.py``/``bench.py`` restored
the lexicographically-newest checkpoint regardless of its architecture, so
a mixed ``runs/`` population (dilated + non-dilated experiments) crashed
``./run.py`` with an Orbax tree dump and made ``bench.py`` silently fall
back to random weights. Now every save records a ``geometry.json`` sidecar,
older checkpoints are inferred from their Orbax param-tree metadata, and
``Engine.restore`` fails with a one-line mismatch error before touching
Orbax. (Reference intent: ``run.py:143-149``'s verify-then-load flow.)
"""

import json
import os
import sys

import pytest

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.utils import checkpoint

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _engine(tmp_path, name=None, **kw):
    cfg = dict(num_layers=2, root_size=4, patch_size=16, stride=16,
               batch_size=4, num_epoch=0,
               save_path=str(tmp_path / "runs"),
               logdir=str(tmp_path / "logs"))
    cfg.update(kw)
    return Engine(Options(**cfg), experiment_name=name)


@pytest.mark.slow
def test_save_writes_geometry_sidecar(tmp_path):
    eng = _engine(tmp_path, dilated_layers=True)
    path = eng.save(0)
    sidecar = os.path.join(path, "geometry.json")
    assert os.path.exists(sidecar)
    assert json.load(open(sidecar)) == {
        "num_layers": 2, "root_size": 4, "dilated_layers": True}
    assert checkpoint.read_geometry(path) == eng.model_geometry


@pytest.mark.slow
def test_infer_geometry_from_orbax_metadata(tmp_path):
    """Pre-sidecar checkpoints are identified from param-tree metadata."""
    eng = _engine(tmp_path, num_layers=3, root_size=8)
    path = eng.save(0)
    os.remove(os.path.join(path, "geometry.json"))
    assert checkpoint.read_geometry(path) == {
        "num_layers": 3, "root_size": 8, "dilated_layers": False}


@pytest.mark.slow
def test_restore_mismatch_is_one_clear_error(tmp_path):
    path = _engine(tmp_path, dilated_layers=False).save(0)
    other = _engine(tmp_path, dilated_layers=True)
    with pytest.raises(ValueError, match="non-dilated.*model is.*dilated"):
        other.restore(file=path)
    # matching geometry restores fine
    _engine(tmp_path, dilated_layers=False).restore(file=path)


@pytest.mark.slow
def test_manifest_ignores_backfilled_sidecar(tmp_path):
    """Adding geometry.json to an old checkpoint must not break its
    SHA256SUMS verification (sidecars are backfilled into pre-existing
    runs whose manifests predate them)."""
    eng = _engine(tmp_path)
    path = eng.save(0)
    os.remove(os.path.join(path, "geometry.json"))
    checkpoint.write_manifest(path)  # manifest without the sidecar
    checkpoint.write_geometry(path, eng.model_geometry)  # backfill
    assert checkpoint.verify_manifest(path) is True


def test_newest_checkpoint_filters_by_geometry(tmp_path):
    """run.py's picker skips architecture-mismatched and sentinel
    checkpoints instead of handing them to a pinned-config Engine."""
    import run as run_script

    a = _engine(tmp_path, name="2026-01-01T00h00m00s", dilated_layers=True)
    a.save(5)
    b = _engine(tmp_path, name="2026-01-02T00h00m00s", dilated_layers=False)
    b.save(3)
    b.save(999)  # interrupt sentinel: never a submission candidate
    save_path = str(tmp_path / "runs")

    dilated = {"num_layers": 2, "root_size": 4, "dilated_layers": True}
    plain = {"num_layers": 2, "root_size": 4, "dilated_layers": False}
    assert run_script.newest_checkpoint(save_path, dilated).endswith(
        os.path.join(a.experiment_name, "model-epoch-005.chkpt"))
    assert run_script.newest_checkpoint(save_path, plain).endswith(
        os.path.join(b.experiment_name, "model-epoch-003.chkpt"))
    none_such = {"num_layers": 9, "root_size": 4, "dilated_layers": False}
    assert run_script.newest_checkpoint(save_path, none_such) is None
    # unconstrained: newest non-sentinel of any architecture
    assert run_script.newest_checkpoint(save_path).endswith(
        "model-epoch-003.chkpt")
