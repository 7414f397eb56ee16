"""Host-side image I/O and visualization outputs.

The only host/NumPy layer in the framework: PNG decode/encode and CSV
writing. All tensor math (quantization, patching, labelling) runs on-device
in ``roadseg_tpu.ops.geometry``; this module just moves bytes.

Reference surface covered (``src/images.py``): ``load`` (:24-32),
``load_train_data`` (:240-253), ``img_float_to_uint8`` (:19-21),
``overlays`` (:102-128), ``save_all`` (:183-203), ``save_submission_csv``
(:206-237), ``overlap_pred_true`` (:284-294), ``overlapp_error`` (:297-310).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from roadseg_tpu.constants import PIXEL_DEPTH
from roadseg_tpu.ops import geometry


def resolve_data_dir(sub: str = "") -> str:
    """Locate the dataset: $ROADSEG_DATA, ./data, or the read-only
    reference mount. Returns the directory joined with ``sub``."""
    for root in (os.environ.get("ROADSEG_DATA"), "./data",
                 "/root/reference/data"):
        if root and os.path.isdir(root):
            return os.path.join(root, sub) if sub else root
    raise FileNotFoundError("no data directory found; set $ROADSEG_DATA")


def img_float_to_uint8(img) -> np.ndarray:
    """[0,1] float array -> uint8, round-half-away like the reference."""
    return (np.asarray(img) * PIXEL_DEPTH).round().astype(np.uint8)


def load(directory: str) -> np.ndarray:
    """Load all PNGs in ``directory`` (sorted by name) into a float32 tensor
    [num_images, H, W(, C)] scaled to [0, 1].

    Uses the native multithreaded libpng batch loader (``native/``) when
    built; falls back to PIL per-file decode otherwise.
    """
    paths = sorted(glob.glob(os.path.join(directory, "*.png")))
    print(f"Loading {len(paths)} images from {directory} ...")
    if not paths:
        return np.zeros((0,), np.float32)
    try:
        from roadseg_tpu.utils import native_loader
        if native_loader.available():
            batch = native_loader.load_png_batch(paths)
            return batch.astype(np.float32) / PIXEL_DEPTH
    except (RuntimeError, OSError) as e:
        print(f"native loader failed ({e}); falling back to PIL")
    imgs = [np.asarray(Image.open(p), dtype=np.float32) / PIXEL_DEPTH
            for p in paths]
    return np.stack(imgs)


def load_train_data(directory: str):
    """Load ``images/`` and ``groundtruth/`` subdirectories.

    Returns (images [N, H, W, 3], groundtruth [N, H, W]) float32 in [0, 1].
    """
    images = load(os.path.join(directory, "images"))
    groundtruth = load(os.path.join(directory, "groundtruth"))
    if groundtruth.ndim == 4:  # some PNGs decode with an alpha/extra channel
        groundtruth = groundtruth[..., 0]
    return images, groundtruth


def overlays(imgs, masks, fade: float = 0.95) -> np.ndarray:
    """Red-transparency prediction overlays.

    imgs: [N, H, W, 3] float [0,1]; masks: [N, H, W(, 1)] float [0,1].
    Returns uint8 RGBA [N, H, W, 4]. Alpha-composites a red layer whose
    alpha is ``mask * fade`` — same visual output as the PIL loop in the
    reference, computed vectorized.
    """
    imgs8 = img_float_to_uint8(imgs).astype(np.float32)
    masks = np.asarray(masks)
    if masks.ndim == 4:
        masks = masks[..., 0]
    alpha = (img_float_to_uint8(masks).astype(np.float32) * fade) / 255.0
    alpha = np.clip(alpha, 0.0, 1.0)[..., None]
    red = np.zeros_like(imgs8)
    red[..., 0] = 255.0
    rgb = red * alpha + imgs8 * (1.0 - alpha)
    out = np.concatenate(
        [rgb, np.full(rgb.shape[:-1] + (1,), 255.0)], axis=-1)
    return np.round(out).astype(np.uint8)


def overlap_pred_true(pred, true) -> np.ndarray:
    """RGB confusion image: prediction in red channel, truth in green."""
    pred8, true8 = img_float_to_uint8(pred), img_float_to_uint8(true)
    out = np.zeros(pred8.shape + (3,), np.uint8)
    out[..., 0] = pred8
    out[..., 1] = true8
    return out


def overlapp_error(pred, true) -> np.ndarray:
    """Inverted-XOR error map: white where prediction agrees with truth."""
    agree = ~np.logical_xor(img_float_to_uint8(pred).astype(bool),
                            img_float_to_uint8(true).astype(bool))
    val = agree.astype(np.uint8) * 255
    return np.stack([val, val, val], axis=-1)


def save_all(images, directory: str, format_: str = "images_{:03d}.png",
             greyscale: bool = False):
    """Save a batch of images as PNGs named ``format_.format(i+1)``."""
    os.makedirs(directory, exist_ok=True)
    images = np.asarray(images)
    if images.ndim == 4 and images.shape[-1] == 1:
        images = images[..., 0]
    for i in range(images.shape[0]):
        img = images[i]
        if img.dtype != np.uint8:
            img = img_float_to_uint8(np.clip(img, 0.0, 1.0))
        mode = "L" if (greyscale and img.ndim == 2) else None
        if img.ndim == 2 and not greyscale:
            img = np.stack([img] * 3, axis=-1)
        Image.fromarray(img, mode=mode).save(
            os.path.join(directory, format_.format(i + 1)))


def save_submission_csv(masks, path: str, patch_size: int) -> str:
    """Write the Kaggle submission CSV.

    masks: binary [N, H, W(, 1)] road masks. Row format
    ``"{img:03d}_{patch_size*j}_{patch_size*i},{label}"`` with j (x-block)
    outer and i (y-block) inner — the exact id ordering of the reference
    (``images.py:232-236``), which follows ``extract_patches``'s
    x-outer/y-inner scan.
    """
    masks = np.asarray(masks)
    if masks.ndim == 4:
        masks = masks[..., 0]
    num, h, w = masks.shape
    assert h == w, "images should be square"
    pps = h // patch_size

    patches = geometry.extract_patches(masks, patch_size)
    labels = np.asarray(geometry.labels_for_patches(patches))
    labels = labels.reshape(num, pps, pps)  # [img, x-block, y-block]

    os.makedirs(path, exist_ok=True)
    filename = os.path.abspath(os.path.join(path, "submission.csv"))
    with open(filename, "w") as f:
        f.write("id,prediction\n")
        for n in range(num):
            for j in range(pps):
                for i in range(pps):
                    f.write(f"{n + 1:03d}_{patch_size * j}_{patch_size * i},"
                            f"{labels[n, j, i]}\n")
    print(f"Saved predictions in {filename}")
    return filename
