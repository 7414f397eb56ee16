"""Observability: metrics + TensorBoard summaries.

Covers the reference ``Summary`` class (``src/summary.py:7-147``):

* scalar loss / learning-rate per step,
* pixel misclassification-rate scalar,
* streaming patch-level accuracy / recall / precision / F1 for eval and
  train scoring (reset per epoch, like ``tf.local_variables_initializer``
  at ``tf_aerial_images.py:428``),
* image summaries: eval masks, overlays, groundtruth gallery, and the
  red/green groundtruth-vs-prediction overlap.

Metric math runs on-device (jnp); the writer is tensorboardX when available
with a JSONL fallback so the engine never hard-depends on TF tooling.

Divergence note: the reference computes streaming metrics over
``np.resize``-zero-filled label tensors (``summary.py:134-139`` quirk,
SURVEY.md §2.11); we compute them over the true patch labels.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from roadseg_tpu.constants import IMG_PATCH_SIZE
from roadseg_tpu.ops import geometry


def img_to_label_patches(imgs, patch_size: int = IMG_PATCH_SIZE):
    """[N, H, W] masks -> int patch labels [N * G * G] at 16x16 granularity."""
    patches = geometry.extract_patches(jnp.asarray(imgs), patch_size)
    return geometry.labels_for_patches(patches)


class StreamingScores:
    """Streaming accuracy/recall/precision/F1 counters (patch level)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.tp = self.fp = self.fn = self.tn = 0

    def update(self, labels, predictions):
        labels = np.asarray(labels).astype(bool).ravel()
        predictions = np.asarray(predictions).astype(bool).ravel()
        self.tp += int(np.sum(predictions & labels))
        self.fp += int(np.sum(predictions & ~labels))
        self.fn += int(np.sum(~predictions & labels))
        self.tn += int(np.sum(~predictions & ~labels))

    @property
    def accuracy(self):
        total = self.tp + self.fp + self.fn + self.tn
        return (self.tp + self.tn) / total if total else 0.0

    @property
    def recall(self):
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def precision(self):
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def f1(self):
        r, p = self.recall, self.precision
        return 0.0 if (r == 0 or p == 0) else 2 / (1 / r + 1 / p)

    def as_dict(self, prefix: str = ""):
        return {f"{prefix}accuracy": self.accuracy,
                f"{prefix}recall": self.recall,
                f"{prefix}precision": self.precision,
                f"{prefix}f1_score": self.f1}


def patch_scores(pred_masks, gt_masks, patch_size: int = IMG_PATCH_SIZE):
    """Patch-level accuracy/recall/precision/F1 between probability masks
    and groundtruth masks — the metric family of the reference's eval
    summaries and the Kaggle score (``summary.py:28-51``, ``:141-147``).

    pred_masks: [N, H, W(, 1)] probabilities; gt_masks: [N, H, W] in [0,1].
    Labels are 16x16-block means > FOREGROUND_THRESHOLD after binarizing
    pixels at 0.5 (the two-stage Kaggle thresholding).
    """
    pred = np.asarray(pred_masks)
    if pred.ndim == 4:
        pred = pred[..., 0]
    pred_lab = img_to_label_patches(
        (pred > 0.5).astype(np.float32), patch_size)
    gt_lab = img_to_label_patches(
        (np.asarray(gt_masks) >= 0.5).astype(np.float32), patch_size)
    s = StreamingScores()
    s.update(np.asarray(gt_lab), np.asarray(pred_lab))
    return s.as_dict()


class _JsonlWriter:
    """Fallback writer: one JSON object per event."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "events.jsonl"), "a")

    def add_scalar(self, tag, value, global_step=None):
        self._f.write(json.dumps({
            "wall_time": time.time(), "tag": tag,
            "value": float(value), "step": int(global_step or 0)}) + "\n")

    def add_image(self, tag, img, global_step=None, dataformats="HWC"):
        # no image payloads in the JSONL stream; record that one was
        # dropped so the fallback is never a *silent* no-op (the engine
        # paths also dump the same images as PNGs)
        self._f.write(json.dumps({
            "wall_time": time.time(), "tag": tag, "dropped_image": True,
            "step": int(global_step or 0)}) + "\n")

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class Summary:
    """Metrics hub: scalars + images to TensorBoard, streaming scores."""

    def __init__(self, logdir: str, num_eval_images: int = 4):
        self.logdir = logdir
        self.num_eval_images = num_eval_images
        try:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(logdir)
        except Exception:
            self._writer = _JsonlWriter(logdir)
        self.eval_scores = StreamingScores()
        self.train_scores = StreamingScores()

    # -- scalars ---------------------------------------------------------
    def add_scalars(self, scalars: dict, step: int):
        for tag, value in scalars.items():
            self._writer.add_scalar(tag, float(value), step)

    def add_to_pixel_misclassification_summary(self, num_errors, total, step):
        self._writer.add_scalar("misclassification_rate",
                                float(num_errors) / max(float(total), 1.0),
                                step)

    # -- eval ------------------------------------------------------------
    def add_to_eval_summary(self, masks, overlays, labels, step: int):
        """masks: [N,H,W,1] probabilities; overlays: uint8 RGBA;
        labels: [M,H,W] groundtruth (first N used)."""
        n = min(self.num_eval_images, np.asarray(masks).shape[0])
        masks = np.asarray(masks)[:n]
        pred = np.asarray(img_to_label_patches(masks[..., 0]))
        true = np.asarray(img_to_label_patches(
            (np.asarray(labels)[:n] >= 0.5).astype(np.float32)))
        self.eval_scores.update(true, pred)
        self.add_scalars(
            {f"eval {k.split('eval_')[-1]}": v
             for k, v in self.eval_scores.as_dict("eval_").items()}, step)
        for i in range(n):
            self._writer.add_image(f"eval_masks/{i}",
                                   np.repeat(masks[i], 3, axis=-1),
                                   step, dataformats="HWC")
            self._writer.add_image(f"eval_images/{i}",
                                   np.asarray(overlays)[i][..., :3],
                                   step, dataformats="HWC")

    def add_to_eval_patch_summary(self, labels, step: int = 0):
        labels = np.asarray(labels)[:self.num_eval_images]
        for i in range(labels.shape[0]):
            img = (np.clip(labels[i], 0, 1) * 255).astype(np.uint8)
            self._writer.add_image(f"eval_groundtruth/{i}",
                                   np.stack([img] * 3, -1), step,
                                   dataformats="HWC")

    def add_to_overlap_summary(self, true_labels, predicted_labels, step: int):
        from roadseg_tpu.utils.images_io import overlap_pred_true
        over = overlap_pred_true(np.asarray(predicted_labels, np.float32),
                                 np.asarray(true_labels, np.float32))
        for i in range(min(self.num_eval_images, over.shape[0])):
            self._writer.add_image(f"groundtruth_vs_prediction/{i}", over[i],
                                   step, dataformats="HWC")

    def add_to_training_summary(self, predictions, labels, step: int):
        pred = np.asarray(img_to_label_patches(
            np.asarray(predictions)[..., 0]
            if np.asarray(predictions).ndim == 4 else predictions))
        true = np.asarray(img_to_label_patches(
            (np.asarray(labels) >= 0.5).astype(np.float32)))
        self.train_scores.update(true, pred)
        self.add_scalars(
            {f"train {k.split('train_')[-1]}": v
             for k, v in self.train_scores.as_dict("train_").items()}, step)

    def reset_scores(self):
        """Per-epoch reset (tf.local_variables_initializer equivalent)."""
        self.eval_scores.reset()
        self.train_scores.reset()

    def flush(self):
        self._writer.flush()

    def close(self):
        self._writer.close()
