"""Checkpoint SHA-256 manifest (reference run.py model-verification parity)."""

import glob
import os

import numpy as np

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.utils.checkpoint import verify_manifest, write_manifest


def _tiny_engine(tmp_path):
    opts = Options(num_layers=2, root_size=4, patch_size=16, stride=16,
                   batch_size=8, num_epoch=0,
                   save_path=str(tmp_path / "runs"),
                   logdir=str(tmp_path / "logs"))
    return Engine(opts)


def test_save_writes_manifest_and_verify_roundtrip(tmp_path, capsys):
    eng = _tiny_engine(tmp_path)
    path = eng.save(0)
    assert os.path.exists(os.path.join(path, "SHA256SUMS"))
    assert verify_manifest(path) is True

    # restore is quiet on a good manifest
    eng.restore(file=path)
    assert "WARNING" not in capsys.readouterr().out

    # corrupt one checkpoint file -> verify fails, restore warns non-fatally
    # geometry.json is advisory metadata excluded from the manifest digest
    victims = [p for p in glob.glob(os.path.join(path, "**", "*"),
                                    recursive=True)
               if os.path.isfile(p) and "SHA256SUMS" not in p
               and "geometry.json" not in p]
    with open(victims[0], "r+b") as f:
        f.seek(0)
        byte = f.read(1)
        f.seek(0)
        f.write(bytes([byte[0] ^ 0xFF]))
    assert verify_manifest(path) is False


def test_verify_without_manifest_returns_none(tmp_path):
    d = tmp_path / "model-epoch-000.chkpt"
    d.mkdir()
    (d / "data").write_bytes(b"x")
    assert verify_manifest(str(d)) is None
    write_manifest(str(d))
    assert verify_manifest(str(d)) is True
