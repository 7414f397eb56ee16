"""Rotation parity tests: the on-device gather must be bit-exact with
``scipy.ndimage.rotate(order=0, reshape=True)`` as used by the reference
training pipeline (``src/images.py:313-351``)."""

import numpy as np
import pytest
from scipy.ndimage import rotate as scipy_rotate

from roadseg_tpu.ops import rotate as r
from roadseg_tpu.ops.geometry import mirror_border


def scipy_expand_and_rotate(imgs, angles, offset=0):
    """Host-side oracle following the reference algorithm exactly:
    mirror-pad by ceil(H*(sqrt2-1)/2) + ceil(offset/sqrt2), rotate each angle
    with scipy order-0 (angle 0 bypasses), center-crop to H + 2*offset."""
    has_channels = imgs.ndim == 4
    if not has_channels:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    out_size = h + 2 * offset
    padding = int(np.ceil(h * (np.sqrt(2) - 1) / 2)) + \
        int(np.ceil(offset / np.sqrt(2)))
    padded = np.pad(imgs, ((0, 0), (padding, padding), (padding, padding),
                           (0, 0)), "symmetric")
    outs = []
    for angle in angles:
        rot = padded if angle == 0 else scipy_rotate(
            padded, angle=angle, axes=(1, 2), order=0)
        size = rot.shape[1]
        half, center = out_size // 2, size // 2
        outs.append(rot[:, center - half:center + half,
                        center - half:center + half])
    out = np.concatenate(outs, axis=0)
    return out if has_channels else out[..., 0]


class TestRotateImgs:
    @pytest.mark.parametrize("angle", [15, 30, 45, 60, 75, 90, 33, -20, 180])
    def test_bit_exact_vs_scipy(self, angle):
        rng = np.random.default_rng(0)
        imgs = rng.random((2, 21, 21, 3)).astype(np.float32)
        got = np.asarray(r.rotate_imgs(imgs, angle))
        want = scipy_rotate(imgs, angle=angle, axes=(1, 2), order=0)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_angle_zero_bypass(self):
        imgs = np.random.default_rng(1).random((1, 9, 9)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(r.rotate_imgs(imgs, 0)), imgs)

    def test_3d_input(self):
        imgs = np.random.default_rng(2).random((2, 15, 15)).astype(np.float32)
        got = np.asarray(r.rotate_imgs(imgs, 37))
        want = scipy_rotate(imgs, angle=37, axes=(1, 2), order=0)
        np.testing.assert_array_equal(got, want)


class TestExpandAndRotate:
    @pytest.mark.parametrize("offset", [0, 10])
    def test_bit_exact_vs_scipy_pipeline(self, offset):
        rng = np.random.default_rng(3)
        imgs = rng.random((2, 40, 40, 3)).astype(np.float32)
        angles = [0, 15, 45, 75]
        got = np.asarray(r.expand_and_rotate(imgs, angles, offset))
        want = scipy_expand_and_rotate(imgs, angles, offset).astype(np.float32)
        assert got.shape == (2 * 4, 40 + 2 * offset, 40 + 2 * offset, 3)
        np.testing.assert_array_equal(got, want)

    def test_groundtruth_3d_offset0(self):
        rng = np.random.default_rng(4)
        masks = (rng.random((3, 40, 40)) > 0.7).astype(np.float32)
        angles = [0, 30, 60]
        got = np.asarray(r.expand_and_rotate(masks, angles, 0))
        want = scipy_expand_and_rotate(masks, angles, 0).astype(np.float32)
        assert got.shape == (9, 40, 40)
        np.testing.assert_array_equal(got, want)

    def test_training_config_shape(self):
        # 400x400 images, offset 188 (6-layer / patch 388 config):
        # output must be 776x776 per the padding formula at images.py:339.
        imgs = np.zeros((1, 400, 400, 3), np.float32)
        out = r.expand_and_rotate(imgs, [0], 188)
        assert out.shape == (1, 776, 776, 3)

    def test_requires_angles(self):
        with pytest.raises(ValueError):
            r.expand_and_rotate(np.zeros((1, 8, 8, 1), np.float32), None, 0)


class TestRotationMirrorParity:
    def test_mirror_border_inside_expand(self):
        # expand_and_rotate(angle 0, offset k) == mirror_border(imgs, k)
        rng = np.random.default_rng(5)
        imgs = rng.random((2, 20, 20, 3)).astype(np.float32)
        got = np.asarray(r.expand_and_rotate(imgs, [0], 6))
        want = np.asarray(mirror_border(imgs, 6))
        np.testing.assert_array_equal(got, want)
