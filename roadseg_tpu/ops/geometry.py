"""On-device image/patch geometry.

TPU-first replacements for the reference's host-side NumPy loops in
``src/images.py``:

* ``extract_patches``       <- triple Python ``for`` at ``images.py:74-83``
* ``images_from_patches``   <- accumulate/count loops at ``images.py:154-162``
* ``mirror_border``         <- ``np.pad(symmetric)`` at ``images.py:269-281``
* ``quantize_mask``         <- per-block loop at ``images.py:256-266``
* ``labels_for_patches``    <- ``images.py:88-99``
* ``predictions_to_patches``<- ``images.py:167-180``
* ``crop_imgs``             <- ``images.py:354-373``

Everything here is pure ``jnp``: shapes are static given the config, so each
function traces once under ``jax.jit`` and XLA fuses the gathers/scatters with
neighbouring ops. Patch scan order is x-outer / y-inner, matching the
reference (``images.py:76-77``) — the Kaggle CSV ordering depends on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def patches_per_side(image_size: int, patch_size: int, stride: int) -> int:
    """Number of sliding-window positions along one image side."""
    if (image_size - patch_size) % stride != 0:
        raise ValueError(
            f"Stride sliding should cover the whole image: "
            f"(image_size={image_size} - patch_size={patch_size}) "
            f"% stride={stride} != 0"
        )
    return (image_size - patch_size) // stride + 1


def _window_index(image_size: int, patch_size: int, stride: int) -> np.ndarray:
    """[G, P] int32 index matrix: row g holds g*stride + arange(P)."""
    g = patches_per_side(image_size, patch_size, stride)
    starts = np.arange(g, dtype=np.int32) * stride
    return starts[:, None] + np.arange(patch_size, dtype=np.int32)[None, :]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _extract_patches_4d(images, patch_size: int, stride: int, order_xy: bool):
    n, h, w, c = images.shape
    idx = jnp.asarray(_window_index(h, patch_size, stride))
    g, p = idx.shape
    # Gather rows then columns: two XLA gathers, no host loop.
    rows = jnp.take(images, idx.reshape(-1), axis=1)
    rows = rows.reshape(n, g, p, w, c)
    cols = jnp.take(rows, idx.reshape(-1), axis=3)
    cols = cols.reshape(n, g, p, g, p, c)  # [N, Gy, Py, Gx, Px, C]
    if order_xy:
        # x-outer / y-inner flat order (reference images.py:76-77)
        cols = cols.transpose(0, 3, 1, 2, 4, 5)  # [N, Gx, Gy, Py, Px, C]
    return cols.reshape(n * g * g, p, p, c)


def extract_patches(images, patch_size: int, stride: int | None = None,
                    predict_patch_size: int | None = None):
    """Extract square sliding-window patches from a batch of square images.

    images: [N, H, W, C] or [N, H, W] (jnp or np)
    Returns [N*G*G, P, P(, C)] in x-outer / y-inner order, G patches per side.

    ``predict_patch_size`` is validated for parity with the reference
    signature (``images.py:35-52``) but does not change the output there
    either (the offset it computes is unused in the reference).
    """
    if predict_patch_size is None:
        predict_patch_size = patch_size
    if (patch_size - predict_patch_size) % 2 != 0 or predict_patch_size > patch_size:
        raise ValueError("predict_patch_size must be <= patch_size with even difference")
    if stride is None:
        stride = patch_size

    images = jnp.asarray(images)
    has_channels = images.ndim == 4
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    if h != w:
        raise ValueError("Assume square images")

    out = _extract_patches_4d(images, patch_size, stride, True)
    if not has_channels:
        out = out[..., 0]
    return out


@functools.partial(jax.jit, static_argnums=(1, 2))
def _overlap_add(patches6, image_size: int, stride: int):
    """Overlap-add [N, Gx, Gy, P, P, C] patches into [N, Z, Z, C] images.

    A `lax.scan` over the (static) patch grid performs read-add-write with
    dynamic slices — XLA keeps the accumulator in place, so peak memory is
    one output image plus one patch, unlike a monolithic scatter.
    """
    n, gx, gy, p, _, c = patches6.shape
    num = gx * gy
    flat = patches6.reshape(n, num, p, p, c).transpose(1, 0, 2, 3, 4)
    starts = np.arange(max(gx, 1), dtype=np.int32) * stride
    # flat index i -> (x=starts[i//gy], y=starts[i%gy]) per the x-outer order
    xs = jnp.asarray(starts)[np.arange(num) // gy]
    ys = jnp.asarray(starts)[np.arange(num) % gy]

    def body(acc, inp):
        patch, y0, x0 = inp
        cur = jax.lax.dynamic_slice(acc, (0, y0, x0, 0), (n, p, p, c))
        return jax.lax.dynamic_update_slice(acc, cur + patch, (0, y0, x0, 0)), None

    out = jnp.zeros((n, image_size, image_size, c), patches6.dtype)
    out, _ = jax.lax.scan(body, out, (flat, ys, xs))

    def count_body(acc, inp):
        y0, x0 = inp
        cur = jax.lax.dynamic_slice(acc, (y0, x0), (p, p))
        return jax.lax.dynamic_update_slice(acc, cur + 1.0, (y0, x0)), None

    counts = jnp.zeros((image_size, image_size), patches6.dtype)
    counts, _ = jax.lax.scan(count_body, counts, (ys, xs))
    return out / counts[None, :, :, None]


def images_from_patches(patches, stride: int | None = None):
    """Reassemble overlapping patches into images with overlap-averaging.

    patches: [num_images, num_patches, P, P, C] in x-outer / y-inner order
    (exactly what ``extract_patches`` produces after a reshape). Overlapping
    contributions are summed and divided by per-pixel hit counts, matching
    ``images.py:131-164``.
    """
    patches = jnp.asarray(patches)
    n, num_patches, p, _, c = patches.shape
    if stride is None:
        stride = p
    g = int(np.sqrt(num_patches))
    if g * g != num_patches:
        raise ValueError("Square image assumption broken")
    image_size = (g - 1) * stride + p
    patches6 = patches.reshape(n, g, g, p, p, c)  # [N, Gx, Gy, Py, Px, C]
    return _overlap_add(patches6, image_size, stride)


def mirror_border(images, n: int):
    """Symmetric-pad n pixels on each spatial side.

    images: [N, H, W, C] or [N, H, W]. Matches ``images.py:269-281``.
    """
    images = jnp.asarray(images)
    if images.ndim == 4:
        pad = ((0, 0), (n, n), (n, n), (0, 0))
    else:
        pad = ((0, 0), (n, n), (n, n))
    return jnp.pad(images, pad, mode="symmetric")


def crop_imgs(imgs, crop_size: int):
    """Center-crop square images to ``crop_size`` (``images.py:354-373``)."""
    imgs = jnp.asarray(imgs)
    h = imgs.shape[1]
    if crop_size % 2 != 0 or h < crop_size:
        raise ValueError("crop_size must be even and <= image size")
    half, center = crop_size // 2, h // 2
    sl = slice(center - half, center + half)
    return imgs[:, sl, sl, ...] if imgs.ndim == 3 else imgs[:, sl, sl, :, ...]


def center_crop(x, target_h: int, target_w: int):
    """Center-crop NHWC feature maps to (target_h, target_w).

    Equivalent of ``tf.image.resize_image_with_crop_or_pad`` as used by the
    reference decoder (``unet.py:72-83``) — crop only, offsets floor-divided.
    """
    h, w = x.shape[1], x.shape[2]
    oy, ox = (h - target_h) // 2, (w - target_w) // 2
    return x[:, oy:oy + target_h, ox:ox + target_w, :]


def labels_for_patches(patches, threshold: float | None = None):
    """Patch-level binary labels: mean(patch) > FOREGROUND_THRESHOLD.

    patches: [num_patches, P, P]. Returns int32 [num_patches]. Matches
    ``images.py:88-99``.
    """
    from roadseg_tpu.constants import FOREGROUND_THRESHOLD
    if threshold is None:
        threshold = FOREGROUND_THRESHOLD
    patches = jnp.asarray(patches)
    return (jnp.mean(patches, axis=(1, 2)) > threshold).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def _quantize(masks, threshold, patch_size: int):
    n, h, w, c = masks.shape
    g = h // patch_size
    blocks = masks.reshape(n, g, patch_size, g, patch_size, c)
    frac = jnp.mean((blocks >= 0.5).astype(masks.dtype), axis=(2, 4))
    labels = (frac > threshold).astype(masks.dtype)  # [N, Gy, Gx, C]
    return jnp.broadcast_to(
        labels[:, :, None, :, None, :],
        (n, g, patch_size, g, patch_size, c),
    ).reshape(n, h, w, c)


def quantize_mask(masks, threshold: float, patch_size: int):
    """Per-16x16-block quantization of probability masks to {0, 1}.

    Label = mean(pixel >= 0.5) > threshold, written to every pixel of the
    block (``images.py:256-266``). masks: [N, H, W, 1].
    """
    return _quantize(jnp.asarray(masks), threshold, patch_size)


def predictions_to_patches(predictions, patch_size: int):
    """Broadcast per-patch scalar predictions to constant square patches.

    predictions: [num_predictions] -> [num_predictions, P, P, 1]
    (``images.py:167-180``).
    """
    predictions = jnp.asarray(predictions).reshape(-1, 1, 1, 1)
    return jnp.broadcast_to(
        predictions, (predictions.shape[0], patch_size, patch_size, 1))
