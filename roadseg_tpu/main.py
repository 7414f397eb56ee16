"""CLI orchestration — the counterpart of the reference ``main()``
(``src/tf_aerial_images.py:382-467``) with the identical flow:

build engine -> optional restore -> optional training epochs -> optional
eval-on-train dump -> optional eval/submission -> optional interactive REPL.

Run: ``python -m roadseg_tpu.main --flags...`` (same 25-flag surface as the
reference, see ``roadseg_tpu/config.py``).
"""

from __future__ import annotations

import code
import os
import sys
import time
from typing import Optional

import numpy as np

from roadseg_tpu.config import Options, options_from_args
from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io


def run(opts: Options) -> Optional[Engine]:
    """Build + drive the Engine per ``opts``. Returns the Engine, or
    ``None`` when training was interrupted by SIGTERM/SIGINT (the
    interrupt checkpoint is already written; eval/submission phases are
    intentionally skipped — resume with ``--restore_model``)."""
    import jax
    print(f"Running on {jax.device_count()} {jax.default_backend()} "
          f"device(s)")
    model = Engine(opts)
    print(f"U-Net: {opts.num_layers} layers, root_size {opts.root_size}, "
          f"dilated={opts.dilated_layers} -> {model.num_params:,} params, "
          f"input {model.input_size} -> output {opts.patch_size}")

    # -- restore (tf_aerial_images.py:395-401) -------------------------
    if opts.restore_model:
        if opts.model_path is not None:
            model.restore(file=opts.model_path)
            print(f"Restore model: {opts.model_path}")
        else:
            print(f"Restore date: {opts.restore_date}")
            model.restore(date=opts.restore_date, epoch=opts.restore_epoch)

    # -- training (tf_aerial_images.py:403-430) ------------------------
    if opts.num_epoch > 0:
        train_images, train_groundtruth = images_io.load_train_data(
            opts.train_data_dir)
        model.prepare_training_data(train_images, train_groundtruth)
        model.summary.add_to_eval_patch_summary(train_groundtruth)
        for i in range(opts.num_epoch):
            print(f"==== Train epoch: {i} ====")
            model.reset_scores()
            if model.train(train_images, train_groundtruth):
                # SIGTERM/SIGINT: the interrupt checkpoint is already
                # written; stop the run instead of saving a partial epoch
                print("training interrupted; stopping")
                return None
            model.save(i, blocking=not opts.async_saves
                       or i == opts.num_epoch - 1)

    # -- eval on training data (tf_aerial_images.py:432-445) -----------
    if opts.eval_train:
        print("Evaluate Test")
        eval_images, eval_groundtruth = images_io.load_train_data(
            opts.train_data_dir)
        pred_masks = model.predict_batchwise(eval_images,
                                             opts.pred_batch_size)
        pred_labels = ((pred_masks > 0.5) * 1).squeeze(-1)
        pred_overlays = images_io.overlays(eval_images, pred_masks, fade=0.5)
        overlapped = images_io.overlap_pred_true(pred_labels,
                                                 eval_groundtruth)
        error = images_io.overlapp_error(pred_labels, eval_groundtruth)

        images_io.save_all(pred_labels, opts.eval_data_dir,
                           "eval_binary_pred_{:03d}.png", greyscale=True)
        images_io.save_all(pred_masks, opts.eval_data_dir,
                           "eval_probability_pred_{:03d}.png", greyscale=True)
        images_io.save_all(pred_overlays, opts.eval_data_dir,
                           "eval_overlays_pred_{:03d}.png")
        images_io.save_all(overlapped, opts.eval_data_dir,
                           "eval_confusion_{:03d}.png")
        images_io.save_all(error, opts.eval_data_dir,
                           "eval_orror_{:03d}.png", greyscale=True)

    # -- eval / submission (tf_aerial_images.py:447-463) ----------------
    if opts.eval_data_dir and not opts.eval_train:
        print(f"Running inference on eval data {opts.eval_data_dir}")
        eval_images = images_io.load(opts.eval_data_dir)
        start = time.time()
        masks = model.predict_batchwise(eval_images, opts.pred_batch_size)
        stop = time.time()
        print(f"Prediction time:{(stop - start) / 60} mins")
        masks = np.asarray(geometry.quantize_mask(
            masks, patch_size=IMG_PATCH_SIZE,
            threshold=FOREGROUND_THRESHOLD))
        overlay_imgs = images_io.overlays(eval_images, masks, fade=0.4)
        save_dir = os.path.abspath(
            os.path.join(opts.save_path, model.experiment_name))
        images_io.save_all(overlay_imgs, save_dir)
        images_io.save_submission_csv(masks, save_dir, IMG_PATCH_SIZE)
        model.save(0)  # save the model used for prediction (:461)

    if opts.interactive:
        code.interact(local=dict(globals(), **locals()))
    return model


def main(argv=None):
    # interrupted training (run() -> None) maps to a nonzero exit code
    return 0 if run(options_from_args(argv)) is not None else 1


if __name__ == "__main__":
    sys.exit(main())
