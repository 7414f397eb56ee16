"""On-device arbitrary-angle rotation with bit-exact scipy parity.

The reference rotates training images on the host with
``scipy.ndimage.rotate(order=0, reshape=True)`` (``src/images.py:313-317``)
inside ``expand_and_rotate`` (``images.py:320-351``): mirror-pad, rotate,
center-crop.

TPU-first design: the rotation geometry is *static* given (image size,
angle) — so we precompute the nearest-neighbour source-index maps once on the
host in float64 (using ``scipy.special.cosdg/sindg`` and the exact coordinate
accumulation order of scipy's C ``NI_GeometricTransform``, making the result
bit-identical to the reference's scipy call, ties included), and the on-device
op is a single XLA gather fused with the crop. No per-pixel host loops, no
float32 trig on device.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from scipy import special

from roadseg_tpu.ops.geometry import mirror_border


@functools.lru_cache(maxsize=128)
def rotation_index_map(h: int, w: int, angle: float):
    """Nearest-neighbour index maps replicating scipy rotate(order=0, reshape=True).

    Returns (iy, ix, valid): int32 [OH, OW] source indices into the [h, w]
    input and a bool mask of in-bounds samples (out-of-bounds -> cval 0).
    """
    c, s = special.cosdg(angle), special.sindg(angle)
    rot = np.array([[c, s], [-s, c]])
    out_bounds = rot @ np.array([[0, 0, h, h], [0, w, 0, w]], dtype=np.float64)
    oh, ow = (np.ptp(out_bounds, axis=1) + 0.5).astype(int)
    out_c = rot @ np.array([(oh - 1) / 2, (ow - 1) / 2])
    off = np.array([(h - 1) / 2, (w - 1) / 2]) - out_c
    ys, xs = np.mgrid[0:oh, 0:ow].astype(np.float64)
    # Accumulation order matters for .5 ties: offset first, then y, then x,
    # exactly like scipy's C loop.
    sy = (off[0] + rot[0, 0] * ys) + rot[0, 1] * xs
    sx = (off[1] + rot[1, 0] * ys) + rot[1, 1] * xs
    valid = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
    iy = np.clip(np.floor(sy + 0.5).astype(np.int32), 0, h - 1)
    ix = np.clip(np.floor(sx + 0.5).astype(np.int32), 0, w - 1)
    return iy, ix, valid


def _crop_window(size: int, crop: int) -> slice:
    """Center-crop window used by ``crop_imgs`` (``images.py:354-373``)."""
    half, center = crop // 2, size // 2
    return slice(center - half, center + half)


def rotate_imgs(imgs, angle: float):
    """Rotate a batch [N, H, W, C] / [N, H, W] by ``angle`` degrees.

    Bit-exact with ``scipy.ndimage.rotate(imgs, angle, axes=(1, 2), order=0)``
    (reshape=True, constant cval 0). angle==0 bypasses, like ``images.py:315``.
    """
    if angle == 0:
        return jnp.asarray(imgs)
    imgs = jnp.asarray(imgs)
    iy, ix, valid = rotation_index_map(imgs.shape[1], imgs.shape[2], angle)
    out = imgs[:, jnp.asarray(iy), jnp.asarray(ix)]
    mask = jnp.asarray(valid)
    if imgs.ndim == 4:
        mask = mask[..., None]
    return jnp.where(mask[None], out, jnp.zeros((), imgs.dtype))


def rotation_padding(height: int, offset: int) -> int:
    """Mirror padding needed before rotation (``images.py:339``):
    ceil(H*(sqrt(2)-1)/2) + ceil(offset/sqrt(2)).
    """
    return int(np.ceil(height * (np.sqrt(2) - 1) / 2)) + \
        int(np.ceil(offset / np.sqrt(2)))


def expand_and_rotate(imgs, angles, offset: int = 0):
    """Mirror-pad, rotate by each angle, center-crop to H + 2*offset.

    imgs: [N, H, W(, C)] square. Returns [N * len(angles), out, out(, C)] with
    angle-major ordering (all images at angles[0] first), matching
    ``images.py:320-351``. The rotate+crop pair is fused into one gather per
    angle: the index map is precomputed on host, sliced to the crop window,
    and applied on-device.
    """
    imgs = jnp.asarray(imgs)
    if angles is None:
        raise ValueError(
            "rotation_angles must be provided for training "
            "(include 0 to keep unrotated originals)")
    has_channels = imgs.ndim == 4
    if not has_channels:
        imgs = imgs[..., None]

    n, h, w, c = imgs.shape
    if h != w:
        raise ValueError("Assume square images")
    out_size = h + 2 * offset
    padding = rotation_padding(h, offset)
    padded = mirror_border(imgs, padding)
    ph = padded.shape[1]

    outs = []
    for angle in angles:
        if angle == 0:
            outs.append(padded[:, _crop_window(ph, out_size),
                               _crop_window(ph, out_size), :])
            continue
        iy, ix, valid = rotation_index_map(ph, ph, angle)
        oh = iy.shape[0]
        win = _crop_window(oh, out_size)
        iy, ix, valid = iy[win, win], ix[win, win], valid[win, win]
        rot = padded[:, jnp.asarray(iy), jnp.asarray(ix), :]
        rot = jnp.where(jnp.asarray(valid)[None, :, :, None], rot,
                        jnp.zeros((), padded.dtype))
        outs.append(rot)

    result = jnp.concatenate(outs, axis=0)
    if not has_channels:
        result = result[..., 0]
    return result
