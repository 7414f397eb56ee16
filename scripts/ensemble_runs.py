#!/usr/bin/env python3
"""Probability-mask ensembling across checkpoints/runs, scored against
the reference's winning submission.

The reference's own late 6-layer models hold an extremely stable road
fraction and agree 0.975+ with each other (PARITY.md round-2 table);
single checkpoints of our faster-noisier recipes are more volatile.
Averaging the full 6-way-TTA probability masks of several checkpoints
(across independent runs and/or late epochs of one run) is the direct
way to recover that stability.

Usage:
  python scripts/ensemble_runs.py --member DATE:EPOCH --member DATE:EPOCH
      [--dilated 0] [--dtype bf16|f32] [--out artifacts/ensemble]

Members may span architectures (e.g. non-dilated seeds + a dilated run):
each member's geometry is read from its checkpoint sidecar and an Engine
is (re)built per geometry. Predicted probability masks are cached under
``--mask_cache`` keyed by member id, so re-scoring a different member
subset is pure host-side arithmetic — no TPU time.
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
from roadseg_tpu.utils.checkpoint import Checkpointer, read_geometry
from roadseg_tpu.utils.scoring import compare_submissions

REF_BEST = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
            "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
            "submission.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--member", action="append", required=True,
                   help="DATE:EPOCH, repeatable")
    p.add_argument("--save_path", default="runs")
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--root_size", type=int, default=64)
    p.add_argument("--dilated", type=_str2bool, default=False)
    p.add_argument("--stride", type=int, default=110)
    p.add_argument("--chunk", type=int, default=None,
                   help="device batch: patches/chunk (default 36), or "
                        "full images/chunk in --full_image mode (default "
                        "6 = one image's TTA set)")
    p.add_argument("--pred_batch", type=int, default=2)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="inference activation dtype")
    p.add_argument("--out", default="artifacts/ensemble")
    p.add_argument("--mask_cache", default="artifacts/mask_cache",
                   help="dir of per-member probability-mask .npy files; "
                        "'' disables caching")
    p.add_argument("--ref", default=REF_BEST,
                   help="reference submission CSV to score against")
    p.add_argument("--full_image", type=_str2bool, default=False,
                   help="predict in full-image mode (Options.full_image; "
                        "one valid-conv pass per TTA variant instead of "
                        "the stride sliding window). Cached under a "
                        "'_full' filename suffix so the two modes' masks "
                        "never mix")
    args = p.parse_args(argv)
    if args.chunk is None:
        args.chunk = 6 if args.full_image else 36
    suffix = "_full" if args.full_image else ""

    def _cache_file(mem):
        if not args.mask_cache:
            return None
        date, epoch = mem.rsplit(":", 1)
        return os.path.join(args.mask_cache,
                            f"{date}_epoch{int(epoch):03d}{suffix}.npy")

    if all(f and os.path.exists(f) for f in map(_cache_file, args.member)):
        # Every member is cached: the remaining work (mask averaging,
        # quantize, CSV) is trivial — run it on CPU so a downed TPU
        # tunnel can't hang a pure re-scoring pass.
        import jax
        jax.config.update("jax_platforms", "cpu")

    save_path = os.path.abspath(args.save_path)
    default_geo = {"num_layers": args.layers, "root_size": args.root_size,
                   "dilated_layers": args.dilated}

    def build_engine(geo):
        opts = Options(**geo, patch_size=388,
                       stride=args.stride, batch_size=args.chunk,
                       dtype=args.dtype, full_image=args.full_image,
                       ensemble_prediction=True, num_epoch=0,
                       save_path=save_path, logdir="/tmp/ensemble_logs")
        return Engine(opts)

    imgs = None
    eng, eng_geo = None, None
    if args.mask_cache:
        os.makedirs(args.mask_cache, exist_ok=True)

    acc = None
    used = []
    for mem in args.member:
        date, epoch = mem.rsplit(":", 1)
        cache_file = _cache_file(mem)
        if cache_file and os.path.exists(cache_file):
            masks = np.load(cache_file)
            print(f"{mem}: cached masks {masks.shape}")
        else:
            path = Checkpointer(save_path, date).resolve(
                date=date, epoch=int(epoch))
            if not os.path.isdir(path):
                # a lineage that resumed into a new run dir (or was pruned)
                # simply lacks this epoch — skip, don't abort the populate
                print(f"{mem}: checkpoint missing ({path}); skipping")
                continue
            geo = read_geometry(path) or default_geo
            if eng is None or geo != eng_geo:
                eng, eng_geo = build_engine(geo), geo
            if imgs is None:
                imgs = images_io.load(images_io.resolve_data_dir("test"))
            eng.restore(date=date, epoch=int(epoch))
            t0 = time.time()
            masks = np.asarray(eng.predict_batchwise(imgs, args.pred_batch),
                               np.float32)
            print(f"{mem}: predicted in {time.time() - t0:.1f}s")
            if cache_file:
                np.save(cache_file, masks)
        acc = masks if acc is None else acc + masks
        used.append(mem)
    if acc is None:
        print("no members available", file=sys.stderr)
        return 1
    if len(used) < len(args.member):
        print(f"averaging {len(used)}/{len(args.member)} members "
              f"(missing skipped)")
    mean = np.asarray(acc) / len(used)

    q = np.asarray(geometry.quantize_mask(
        mean, threshold=FOREGROUND_THRESHOLD, patch_size=IMG_PATCH_SIZE))
    os.makedirs(args.out, exist_ok=True)
    images_io.save_submission_csv(q, args.out, IMG_PATCH_SIZE)
    result = compare_submissions(os.path.join(args.out, "submission.csv"),
                                 args.ref)
    result["members"] = used
    print(json.dumps(result))
    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
