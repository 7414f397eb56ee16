"""Course-baseline models — parity with the reference's exploration
notebook and the report's baseline row.

The reference ships the course's provided notebook
(``notebooks/segment_aerial_images.ipynb``) which classifies non-overlapping
16x16 patches with hand features (per-patch mean/variance) + an sklearn
logistic regression, and its report compares the U-Net against a small
"course CNN" baseline (2 conv + 2 FC patch classifier, F1 0.804 —
``report/report.tex:46,261``). This module provides both, TPU-native:

* ``patch_features`` / ``patch_labels`` — vectorized jnp feature extraction
  over the notebook's ``img_crop`` patch grid (x-outer/y-inner scan order,
  matching ``extract_patches``),
* ``LogisticRegression`` — jitted full-batch Newton-free gradient training
  (optax sgd), replacing ``sklearn.linear_model.LogisticRegression``,
* ``PatchCNN`` — the report's 2-conv + 2-FC 16x16-patch classifier,
* ``labels_to_mask`` — the notebook's ``label_to_img`` inverse mapping.

These are baselines for comparison, not part of the U-Net pipeline — same
status as in the reference (SURVEY.md §2.19).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE


def _patch_grid(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N * gx * gy, p, p, C] non-overlapping patches in the
    notebook's ``img_crop`` order (column-block outer, row-block inner)."""
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    p = patch_size
    gy, gx = h // p, w // p
    # [N, gy, p, gx, p, C] -> order (N, gx, gy): x outer, y inner
    t = imgs[:, :gy * p, :gx * p, :].reshape(n, gy, p, gx, p, c)
    t = t.transpose(0, 3, 1, 2, 4, 5)  # [N, gx, gy, p, p, C]
    return t.reshape(n * gx * gy, p, p, c)


@functools.partial(jax.jit, static_argnames=("patch_size", "mode"))
def patch_features(imgs, patch_size: int = IMG_PATCH_SIZE,
                   mode: str = "rgb") -> jnp.ndarray:
    """Per-patch mean/variance features (notebook ``extract_features`` /
    ``extract_features_2d``): 6-d for mode="rgb", 2-d for mode="gray"."""
    patches = _patch_grid(jnp.asarray(imgs, jnp.float32), patch_size)
    if mode == "gray":
        patches = patches.mean(axis=-1, keepdims=True)
    m = patches.mean(axis=(1, 2))
    v = patches.var(axis=(1, 2))
    return jnp.concatenate([m, v], axis=-1)


@functools.partial(jax.jit, static_argnames=("patch_size", "threshold"))
def patch_labels(gt, patch_size: int = IMG_PATCH_SIZE,
                 threshold: float = FOREGROUND_THRESHOLD) -> jnp.ndarray:
    """Patch class = mean(groundtruth patch) > threshold (notebook
    ``value_to_class`` with the course's 0.25 foreground threshold)."""
    patches = _patch_grid(jnp.asarray(gt, jnp.float32), patch_size)
    return (patches.mean(axis=(1, 2, 3)) > threshold).astype(jnp.int32)


def labels_to_mask(labels, image_size: int,
                   patch_size: int = IMG_PATCH_SIZE) -> np.ndarray:
    """Paint per-patch labels back to an [H, W] mask (notebook
    ``label_to_img``), same x-outer/y-inner order as ``_patch_grid``."""
    g = image_size // patch_size
    lab = np.asarray(labels, np.float32).reshape(g, g)  # [gx, gy]
    # lab[jx, iy] fills mask[iy*p:(iy+1)p, jx*p:(jx+1)p]
    return np.kron(lab.T, np.ones((patch_size, patch_size), np.float32))


class LogisticRegression:
    """Jitted logistic regression over patch features.

    Replaces the notebook's ``sklearn.linear_model.LogisticRegression``
    (``class_weight="balanced"`` reproduced via inverse-frequency sample
    weights). Full-batch gradient descent — the problem is 6-dimensional.
    """

    def __init__(self, lr: float = 0.5, steps: int = 500,
                 balanced: bool = True):
        self.lr, self.steps, self.balanced = lr, steps, balanced
        self.w = None
        self.b = None

    def fit(self, X, y):
        X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        n, d = X.shape
        if self.balanced:
            pos = jnp.clip(y.sum(), 1, n - 1)
            sw = jnp.where(y > 0.5, n / (2.0 * pos), n / (2.0 * (n - pos)))
        else:
            sw = jnp.ones((n,), jnp.float32)
        # standardize for conditioning; fold back into (w, b) after
        mu, sd = X.mean(0), X.std(0) + 1e-8
        Xs = (X - mu) / sd

        def loss_fn(p):
            logits = Xs @ p["w"] + p["b"]
            ce = optax.sigmoid_binary_cross_entropy(logits, y)
            return (sw * ce).mean()

        tx = optax.sgd(self.lr, momentum=0.9)
        params = {"w": jnp.zeros((d,), jnp.float32),
                  "b": jnp.zeros((), jnp.float32)}

        @jax.jit
        def run(params):
            state = tx.init(params)

            def step(carry, _):
                params, state = carry
                grads = jax.grad(loss_fn)(params)
                updates, state = tx.update(grads, state, params)
                return (optax.apply_updates(params, updates), state), None

            (params, _), _ = jax.lax.scan(step, (params, state), None,
                                          length=self.steps)
            return params

        params = run(params)
        self.w = np.asarray(params["w"] / sd)
        self.b = float(params["b"] - jnp.dot(params["w"], mu / sd))
        return self

    def predict(self, X) -> np.ndarray:
        X = np.asarray(X, np.float32)
        return (X @ self.w + self.b > 0).astype(np.int32)


class PatchCNN(nn.Module):
    """The report's course-CNN baseline shape: two 5x5 conv + pool stages
    and two fully-connected layers over a 16x16 RGB patch
    (``report/report.tex:46``: F1 0.804 on Kaggle)."""
    features: int = 32
    hidden: int = 512

    @nn.compact
    def __call__(self, x):  # x: [B, 16, 16, 3]
        x = x - 0.5
        x = nn.Conv(self.features, (5, 5), padding="SAME")(x)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = nn.Conv(self.features * 2, (5, 5), padding="SAME")(x)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(2)(x)


def train_patch_cnn(imgs, gt, *, epochs: int = 5, batch_size: int = 256,
                    lr: float = 1e-3, seed: int = 2017,
                    patch_size: int = IMG_PATCH_SIZE
                    ) -> Tuple[PatchCNN, dict]:
    """Train the baseline patch CNN; returns (model, params)."""
    X = np.asarray(_patch_grid(jnp.asarray(imgs, jnp.float32), patch_size))
    y = np.asarray(patch_labels(gt, patch_size))
    model = PatchCNN()
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, patch_size, patch_size, 3)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = X.shape[0]
    batch_size = min(batch_size, n)  # never a zero-step "training run"
    rs = np.random.RandomState(seed)
    for _ in range(epochs):
        order = rs.permutation(n)
        for off in range(0, n - batch_size + 1, batch_size):
            sel = order[off:off + batch_size]
            params, opt_state, _ = step(params, opt_state,
                                        jnp.asarray(X[sel]),
                                        jnp.asarray(y[sel]))
    return model, params


def predict_patch_cnn(model: PatchCNN, params, imgs,
                      patch_size: int = IMG_PATCH_SIZE) -> np.ndarray:
    """Per-patch class predictions in ``img_crop`` order."""
    X = _patch_grid(jnp.asarray(imgs, jnp.float32), patch_size)
    logits = jax.jit(model.apply)(params, X)
    return np.asarray(jnp.argmax(logits, axis=-1), np.int32)
