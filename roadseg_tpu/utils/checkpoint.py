"""Checkpoint save/restore with the reference's addressing semantics.

Reference (``src/tf_aerial_images.py:343-379``): TF Saver writes
``<save_path>/<experiment>/model-epoch-{epoch:03d}.chkpt`` every epoch
(max_to_keep=100) and restores by explicit file, by date directory (newest
when None), or by epoch (newest when None).

TPU-native: Orbax checkpoints of the full train state pytree (params +
optimizer trace + step), same directory layout and resolution order.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

MAX_TO_KEEP = 100
_EPOCH_FMT = "model-epoch-{:03d}.chkpt"
_EPOCH_GLOB = "model-epoch-*.chkpt"


class Checkpointer:
    def __init__(self, save_path: str, experiment_name: str):
        self.save_path = os.path.abspath(save_path)
        self.experiment_name = experiment_name
        self._ckpt = ocp.StandardCheckpointer()
        self._saved: list[str] = []

    @property
    def experiment_dir(self) -> str:
        return os.path.join(self.save_path, self.experiment_name)

    def save(self, state: Any, epoch: int = 0) -> str:
        """Save train-state pytree as ``<experiment>/model-epoch-NNN.chkpt``."""
        path = os.path.join(self.experiment_dir, _EPOCH_FMT.format(epoch))
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        self._saved.append(path)
        if len(self._saved) > MAX_TO_KEEP:
            import shutil
            victim = self._saved.pop(0)
            shutil.rmtree(victim, ignore_errors=True)
        print(f"Model saved in file: {path}")
        return path

    def resolve(self, date: Optional[str] = None,
                epoch: Optional[int] = None,
                file: Optional[str] = None) -> str:
        """Resolution order: explicit file > date dir (newest if None) >
        epoch within it (newest if None)."""
        if file is not None:
            return file
        if date is None:
            dates = [d for d in glob.glob(os.path.join(self.save_path, "*"))
                     if os.path.isdir(d)]
            if not dates:
                raise FileNotFoundError(
                    f"no checkpoint directories under {self.save_path}")
            exp_dir = sorted(dates)[-1]
        else:
            exp_dir = os.path.join(self.save_path, date)
        if epoch is None:
            candidates = sorted(glob.glob(os.path.join(exp_dir, _EPOCH_GLOB)))
            if not candidates:
                raise FileNotFoundError(f"no checkpoints in {exp_dir}")
            return candidates[-1]
        return os.path.join(exp_dir, _EPOCH_FMT.format(epoch))

    def restore(self, template: Any, date: Optional[str] = None,
                epoch: Optional[int] = None, file: Optional[str] = None):
        """Restore a pytree shaped like ``template`` (abstract or concrete)."""
        path = self.resolve(date=date, epoch=epoch, file=file)
        state = self._ckpt.restore(path, template)
        print(f"Model restored from file: {path}")
        return state
