"""Graceful-interruption checkpointing (beyond-parity failure recovery)."""

import glob
import os
import signal
import threading

import numpy as np

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
import pytest


@pytest.mark.slow
def test_sigterm_mid_epoch_checkpoints_and_returns(tmp_path):
    opts = Options(num_layers=2, root_size=4, patch_size=16, stride=16,
                   batch_size=8, num_epoch=1, eval_every=0,
                   train_score_every=0, seed=3,
                   save_path=str(tmp_path / "runs"),
                   logdir=str(tmp_path / "logs"))
    eng = Engine(opts)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
    gt = (rng.rand(4, 64, 64) > 0.5).astype(np.float32)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])

    handler_before = signal.getsignal(signal.SIGTERM)
    timer = threading.Timer(0.5, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        interrupted = eng.train()  # must return (not die) once signal lands
    finally:
        timer.cancel()

    assert interrupted is True, "train() must report the interruption"
    ckpts = glob.glob(str(tmp_path / "runs" / "*" / "model-epoch-999.chkpt"))
    assert ckpts, "no interruption checkpoint written"
    # handlers restored to what they were before train()
    assert signal.getsignal(signal.SIGTERM) is handler_before
    eng2 = Engine(opts)
    eng2._checkpointer.save_path = eng._checkpointer.save_path
    eng2.restore(date=eng.experiment_name)  # newest = the 999 checkpoint
    assert int(np.asarray(eng2.state["step"])) > 0

    # a subsequent successful regular save removes the stale sentinel so
    # newest-epoch resolution can never restore mid-epoch weights again
    eng2.save(epoch=5)
    assert not glob.glob(
        str(tmp_path / "runs" / "*" / "model-epoch-999.chkpt"))
    resolved = eng2._checkpointer.resolve(date=eng.experiment_name)
    assert resolved.endswith("model-epoch-005.chkpt")


def test_uninterrupted_train_returns_false(tmp_path):
    opts = Options(num_layers=2, root_size=4, patch_size=16, stride=16,
                   batch_size=8, num_epoch=1, eval_every=0,
                   train_score_every=0, seed=3,
                   save_path=str(tmp_path / "runs"),
                   logdir=str(tmp_path / "logs"))
    eng = Engine(opts)
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
    gt = (rng.rand(2, 32, 32) > 0.5).astype(np.float32)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])
    assert eng.train() is False
