#!/usr/bin/env python3
"""Train the flagship config ("Mango": 6-layer dilated U-Net, the
reference's best — ``report/report.tex:267``) with a held-out validation
split and per-epoch patch-F1 reporting.

The reference validated via Kaggle's hidden test set (F1 0.939 / score
94.124). Without the Kaggle server we hold out the last N training images
and report patch-level F1 there after each epoch, plus a final 6-way
ensemble evaluation.

Usage: python scripts/train_flagship.py [--epochs 12] [--val 10]
                                        [--batch 8] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine, TrainingDivergedError
from roadseg_tpu.utils import images_io
from roadseg_tpu.utils.summary import patch_scores


def _start_stall_watchdog(model, timeout_s=None):
    """Self-kill on step-progress stall.

    The axon tunnel, when it wedges, hangs device calls forever with no
    RPC error (three wedges in 90 min on 2026-08-20 alone, one of which
    silently ate 5 epochs). The retry queue recovers a DEAD attempt fine
    — so the cleanest watchdog is in-process: a daemon thread watches
    ``Engine._global_step`` and hard-exits (code 8) when no step lands
    for ``timeout_s``. Worst legitimate no-step gaps are the first jit
    compile and the epoch boundary (eval + checkpoint, ~3-4 min on the
    tunnel), both well under the default 8 min."""
    import threading

    timeout_s = timeout_s or int(os.environ.get("TRAIN_STALL_TIMEOUT_S",
                                                "480"))

    def watch():
        last_step, last_t = -1, time.time()
        while True:
            time.sleep(30)
            step = model._global_step
            if step != last_step:
                last_step, last_t = step, time.time()
            elif time.time() - last_t > timeout_s:
                print(f"STALLED: no step progress for {timeout_s}s at "
                      f"step {step}; exiting 8 for the retry queue",
                      file=sys.stderr, flush=True)
                os._exit(8)

    threading.Thread(target=watch, name="stall-watchdog",
                     daemon=True).start()


def main(argv=None):
    p = argparse.ArgumentParser()
    # defaults = the validated fast recipe (PARITY.md: batch 8 no-remat,
    # lr linearly scaled from the reference's batch-1 lr 0.01)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--val", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (effective batch "
                        "= batch*grad_accum; scale --lr accordingly)")
    p.add_argument("--lr", type=float, default=0.08)
    p.add_argument("--stride", type=int, default=12)
    # the reference's published training recipe (README.md:55-70):
    # rotation_angles 15,30,45,60,75 — no unrotated originals
    p.add_argument("--angles", type=str, default="15,30,45,60,75")
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--dilated", type=lambda s: s != "0", default=True)
    p.add_argument("--dropout", type=float, default=1.0)
    p.add_argument("--decay_steps", type=int, default=None,
                   help="LR staircase length in steps; default "
                        "1000//batch = the reference's batch-1 anneal")
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--save_path", default=os.path.abspath("./runs"))
    p.add_argument("--resume", default=None,
                   help="experiment date dir to restore the newest epoch "
                        "from before continuing")
    p.add_argument("--resume_epoch", type=int, default=None,
                   help="specific epoch to restore (default newest)")
    p.add_argument("--start_epoch", type=int, default=0,
                   help="first epoch number for logging/checkpoint names")
    p.add_argument("--save_from", type=int, default=0,
                   help="skip checkpoint saves before this epoch (saves "
                        "~1 min/epoch of device_get+write for big models)")
    p.add_argument("--async_saves", type=lambda s: s != "0", default=False,
                   help="overlap per-epoch checkpoint writes (host fetch + "
                        "Orbax + SHA manifest, ~40-70 s each on the "
                        "tunneled v5e) with the next epoch's compute "
                        "(Engine.save(blocking=False))")
    p.add_argument("--light_saves", type=lambda s: s != "0", default=True,
                   help="save params-only checkpoints (halves the per-epoch "
                        "device_get+write; sweeps/SWA/ensembling need only "
                        "params). The final epoch is always saved full so "
                        "--resume continues with exact momentum.")
    p.add_argument("--class_weight_road", type=float, default=1.0,
                   help="CE weight on road pixels (<1 lowers predicted "
                        "road fraction; 1.0 = reference-faithful)")
    p.add_argument("--seed", type=int, default=2017,
                   help="training seed (init, shuffle, augmentation)")
    p.add_argument("--quick", action="store_true",
                   help="tiny smoke config (1 epoch, 1 angle, 20 imgs)")
    args = p.parse_args(argv)

    angles = [int(a) for a in args.angles.split(",")]
    if args.quick:
        args.epochs, angles = 1, [0]

    decay_steps = args.decay_steps
    if decay_steps is None:
        decay_steps = max(1, 1000 // (args.batch * args.grad_accum))
    opts = Options(
        num_layers=args.layers, root_size=64, dilated_layers=args.dilated,
        patch_size=388, stride=args.stride, batch_size=args.batch,
        grad_accum=args.grad_accum,
        dropout=args.dropout, image_augmentation=True, rotation_angles=angles,
        lr=args.lr, momentum=0.9, num_epoch=args.epochs,
        decay_steps=decay_steps,
        eval_every=0, train_score_every=0, remat=args.remat,
        class_weight_road=args.class_weight_road,
        seed=args.seed,
        save_path=args.save_path,
        logdir=os.path.join(args.save_path, "logs"),
    )
    # a resumed run continues in the SAME experiment dir so the lineage's
    # epochs stay together (round-5 incident: a resumed attempt wrote its
    # epochs into a fresh timestamp dir, orphaning them from the lineage)
    model = Engine(opts, experiment_name=args.resume or None)
    with open("/tmp/train_flagship.pid", "w") as f:
        f.write(str(os.getpid()))
    _start_stall_watchdog(model)
    print(f"model: {model.num_params:,} params, input {model.input_size}")
    if args.resume:
        model.restore(date=args.resume, epoch=args.resume_epoch)

    data_root = images_io.resolve_data_dir()
    imgs, gt = images_io.load_train_data(os.path.join(data_root, "training"))
    if args.quick:
        imgs, gt = imgs[:20], gt[:20]
    n_val = min(args.val, imgs.shape[0] // 5)
    if n_val > 0:
        tr_imgs, tr_gt = imgs[:-n_val], gt[:-n_val]
        va_imgs, va_gt = imgs[-n_val:], gt[-n_val:]
    else:  # train on everything; val set = last 10 (training-set score)
        tr_imgs, tr_gt = imgs, gt
        va_imgs, va_gt = imgs[-10:], gt[-10:]
    model.prepare_training_data(tr_imgs, tr_gt, rotation_angles=angles)

    results = []
    for epoch in range(args.start_epoch, args.epochs):
        print(f"==== Train epoch: {epoch} ====")
        model.reset_scores()
        t0 = time.time()
        try:
            interrupted = model.train(tr_imgs, tr_gt)
        except TrainingDivergedError as e:
            # Non-finite loss mid-epoch: exit 7 BEFORE any save, same
            # retry-queue semantics as the epoch-level f1==0 guard below
            # (seed-51 postmortem).
            print(f"DIVERGED mid-epoch {epoch}: {e}", file=sys.stderr)
            return 7
        if interrupted:
            print("training interrupted; stopping (resume with --resume "
                  f"{model.experiment_name})")
            return 1
        train_s = time.time() - t0

        t0 = time.time()
        masks = model.predict_batchwise(va_imgs, 2)
        scores = patch_scores(masks, va_gt)
        rec = {"epoch": epoch, "train_s": round(train_s, 1),
               "eval_s": round(time.time() - t0, 1),
               **{k: round(v, 4) for k, v in scores.items()}}
        results.append(rec)
        print(json.dumps(rec))
        # Divergence guard (round-5 incident): a resume right after an
        # axon tunnel flap produced NaN loss from the very first step —
        # the restored checkpoint was verified clean, so the corruption
        # was device-state, not weights. A collapsed model (zero road
        # recall) must abort with a distinct exit code BEFORE saving, so
        # the retry queue re-resumes from the last good epoch instead of
        # committing five junk epochs to the lineage.
        if rec["f1_score"] == 0.0 and (epoch > 0 or args.resume):
            print(f"DIVERGED at epoch {epoch} (f1 0.0, recall "
                  f"{rec['recall']}): aborting without saving; resume "
                  f"from the last good checkpoint", file=sys.stderr)
            return 7
        if epoch >= args.save_from:
            # the final epoch's save is always blocking+full so the run
            # ends with a resume-exact checkpoint on disk
            final = epoch == args.epochs - 1
            model.save(epoch, light=args.light_saves and not final,
                       blocking=not args.async_saves or final)
        os.makedirs(model._checkpointer.experiment_dir, exist_ok=True)
        with open(os.path.join(model._checkpointer.experiment_dir,
                               "val_scores.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    model.finish_saves()  # surface any async-save error before the eval
    # final: 6-way ensemble eval (the Kaggle inference config; the
    # ensemble flag is part of the predict-fn cache key)
    model._options.ensemble_prediction = True
    masks = model.predict_batchwise(va_imgs, 2)
    scores = patch_scores(masks, va_gt)
    print("ensemble val:", json.dumps(
        {k: round(v, 4) for k, v in scores.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
