#!/usr/bin/env python3
"""Sweep flagship checkpoints: for each epoch, run the full ensemble
submission inference on the 50 test images and score patch agreement vs the
reference's winning 94.124 CSV (the round's parity proxy — the reference
itself selected its submission epoch by Kaggle feedback).

One Engine instance is reused, so the jitted predict program compiles once
and each additional epoch costs only restore + inference (~30 s).

Usage: python scripts/sweep_epochs.py --epochs 24-47 [--date DIR]
                                      [--out artifacts/sweep.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options, _str2bool
from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io
from roadseg_tpu.utils.checkpoint import parse_epoch_spec
from roadseg_tpu.utils.scoring import compare_submissions

REF_BEST = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
            "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
            "submission.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", required=True, help='e.g. "24-47" or "30,40"')
    p.add_argument("--date", default=None)
    p.add_argument("--save_path", default="runs")
    p.add_argument("--pred_batch", type=int, default=2)
    p.add_argument("--out", default="artifacts/sweep.jsonl")
    # model geometry (defaults = flagship submission config)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--root_size", type=int, default=64)
    p.add_argument("--dilated", type=_str2bool, default=True)
    p.add_argument("--patch_size", type=int, default=388)
    p.add_argument("--stride", type=int, default=110)
    p.add_argument("--chunk", type=int, default=36)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="inference activation dtype")
    args = p.parse_args(argv)

    opts = Options(num_layers=args.layers, root_size=args.root_size,
                   dilated_layers=args.dilated,
                   patch_size=args.patch_size, stride=args.stride,
                   batch_size=args.chunk, dtype=args.dtype,
                   ensemble_prediction=True, num_epoch=0,
                   save_path=os.path.abspath(args.save_path),
                   logdir=os.path.join(os.path.abspath(args.save_path),
                                       "logs"))
    model = Engine(opts)
    imgs = images_io.load(images_io.resolve_data_dir("test"))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = []
    epochs = parse_epoch_spec(args.epochs)
    for epoch in epochs:
        try:
            model.restore(date=args.date, epoch=epoch)
        except FileNotFoundError as e:
            print(f"epoch {epoch}: skip, checkpoint missing ({e})")
            continue
        except ValueError as e:
            # orbax tree mismatch = wrong --layers/--root_size/--dilated
            # for this run; every epoch would fail the same way
            print(f"epoch {epoch}: restore failed — model geometry flags "
                  f"do not match this run?\n{e}", file=sys.stderr)
            return 1
        t0 = time.time()
        masks = model.predict_batchwise(imgs, args.pred_batch)
        q = np.asarray(geometry.quantize_mask(
            masks, threshold=FOREGROUND_THRESHOLD,
            patch_size=IMG_PATCH_SIZE))
        tmp_dir = f"/tmp/sweep_epoch_{epoch}"
        csv = images_io.save_submission_csv(q, tmp_dir, IMG_PATCH_SIZE)
        rec = {"epoch": epoch, "secs": round(time.time() - t0, 1)}
        if os.path.exists(REF_BEST):
            rec.update({k: round(v, 4)
                        for k, v in compare_submissions(csv, REF_BEST).items()})
        results.append(rec)
        print(json.dumps(rec))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if not results:
        print(f"no checkpoints found for epochs {epochs}", file=sys.stderr)
        return 1
    if "agreement" in results[0]:
        best = max(results, key=lambda r: r.get("agreement", 0))
        print("best:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
