#!/usr/bin/env python3
"""Generate a Kaggle submission from the newest flagship checkpoint and
compare it patch-by-patch against the reference's winning submission
(94.124) as a parity proxy.

Usage: python scripts/make_submission.py [--ckpt PATH] [--out DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options
from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io
from roadseg_tpu.utils.scoring import compare_submissions

REF_BEST = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
            "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
            "submission.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--pred_batch", type=int, default=2)
    args = p.parse_args(argv)

    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(glob.glob("runs/*/model-epoch-*.chkpt"))
        if not cands:
            print("no checkpoint found", file=sys.stderr)
            return 1
        ckpt = cands[-1]
    ckpt = os.path.abspath(ckpt)  # orbax requires absolute paths
    out_dir = args.out or os.path.join(os.path.dirname(ckpt), "submission")

    # adopt the checkpoint's own model geometry (Orbax sidecar or npz
    # __geometry__); the dilated flagship is only the fallback for bare
    # checkpoints without one
    from roadseg_tpu.utils import checkpoint as ckpt_lib
    geo = ckpt_lib.read_geometry(ckpt) or dict(
        num_layers=6, root_size=64, dilated_layers=True)
    opts = Options(**geo,
                   patch_size=388, stride=110, batch_size=9,
                   ensemble_prediction=True, num_epoch=0,
                   save_path="runs", logdir="runs/logs")
    model = Engine(opts)
    model.restore(file=ckpt)

    imgs = images_io.load(images_io.resolve_data_dir("test"))
    start = time.time()
    masks = model.predict_batchwise(imgs, args.pred_batch)
    elapsed = time.time() - start
    print(f"{imgs.shape[0]} images in {elapsed:.1f}s "
          f"({imgs.shape[0] / elapsed:.3f} img/s)")

    q = np.asarray(geometry.quantize_mask(
        masks, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    csv = images_io.save_submission_csv(q, out_dir, IMG_PATCH_SIZE)

    if os.path.exists(REF_BEST):
        r = compare_submissions(csv, REF_BEST)
        print("vs reference winning submission (Kaggle 94.124):")
        print(json.dumps({k: round(v, 4) for k, v in r.items()}))
        with open(os.path.join(out_dir, "parity.json"), "w") as f:
            json.dump({"checkpoint": ckpt, "img_per_s": imgs.shape[0] / elapsed,
                       **r}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
