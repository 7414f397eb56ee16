"""Tests for the course-baseline models (notebook parity — SURVEY §2.19).

Pins: patch-grid scan order vs the notebook's ``img_crop``/``label_to_img``
pair, feature semantics (mean/var), balanced logistic regression learning a
separable problem, and the PatchCNN beating a trivial classifier on
synthetic road-like data.
"""

import numpy as np

from roadseg_tpu.models import baseline
import pytest


def _img_crop_reference(im, w, h):
    """The notebook's img_crop, transcribed behaviorally: column-block
    outer, row-block inner."""
    out = []
    for i in range(0, im.shape[1], h):
        for j in range(0, im.shape[0], w):
            out.append(im[j:j + w, i:i + h] if im.ndim == 2
                       else im[j:j + w, i:i + h, :])
    return out


def test_patch_grid_matches_notebook_img_crop_order():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    ours = np.asarray(baseline._patch_grid(img[None], 16))
    ref = np.stack(_img_crop_reference(img, 16, 16))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_patch_features_mean_var():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    feats = np.asarray(baseline.patch_features(img[None], 16, mode="rgb"))
    assert feats.shape == (4, 6)
    first = img[:16, :16]  # patch 0 = (x-block 0, y-block 0)
    np.testing.assert_allclose(feats[0, :3], first.mean(axis=(0, 1)),
                               rtol=1e-5)
    np.testing.assert_allclose(feats[0, 3:], first.var(axis=(0, 1)),
                               rtol=1e-4)
    gray = np.asarray(baseline.patch_features(img[None], 16, mode="gray"))
    assert gray.shape == (4, 2)


def test_patch_labels_threshold():
    gt = np.zeros((1, 32, 32), np.float32)
    gt[0, :16, :16] = 1.0          # patch (0,0) fully road
    gt[0, 20:24, 20:24] = 1.0      # 16/256 = 6% road < 0.25
    y = np.asarray(baseline.patch_labels(gt, 16))
    assert y.tolist() == [1, 0, 0, 0]


def test_labels_to_mask_roundtrip():
    rng = np.random.RandomState(2)
    mask = rng.randint(0, 2, (48, 48)).astype(np.float32)
    # make it patch-constant
    mask = np.asarray(baseline.labels_to_mask(
        np.asarray(baseline.patch_labels(mask[None], 16, threshold=0.5)),
        48, 16))
    y = np.asarray(baseline.patch_labels(mask[None], 16))
    again = baseline.labels_to_mask(y, 48, 16)
    np.testing.assert_array_equal(mask, again)


def test_logreg_learns_separable():
    rng = np.random.RandomState(3)
    X = rng.randn(400, 6).astype(np.float32)
    w_true = np.array([1.0, -2.0, 0.5, 0.0, 3.0, -1.0], np.float32)
    y = (X @ w_true > 0).astype(np.int32)
    clf = baseline.LogisticRegression(steps=800).fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.97


@pytest.mark.slow
def test_patch_cnn_learns_synthetic_roads():
    rng = np.random.RandomState(4)
    n = 6
    imgs = rng.rand(n, 64, 64, 3).astype(np.float32) * 0.2
    gt = np.zeros((n, 64, 64), np.float32)
    for i in range(n):
        col = rng.randint(0, 4) * 16
        imgs[i, :, col:col + 16, :] = 0.9  # bright vertical road
        gt[i, :, col:col + 16] = 1.0
    model, params = baseline.train_patch_cnn(imgs, gt, epochs=8,
                                             batch_size=32)
    preds = baseline.predict_patch_cnn(model, params, imgs)
    y = np.asarray(baseline.patch_labels(gt, 16))
    f1_den = (preds == 1).sum() + (y == 1).sum()
    tp = ((preds == 1) & (y == 1)).sum()
    f1 = 2 * tp / max(f1_den, 1)
    assert f1 > 0.9
