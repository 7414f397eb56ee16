"""Patch-geometry round-trip tests.

The four valid golden shape cases from the reference test suite
(``src/test_images.py:10-121``) plus exact-value checks of the on-device
implementations against straightforward NumPy references.
"""

import numpy as np
import pytest

from roadseg_tpu.ops import geometry


def np_extract_patches(images, patch_size, stride):
    """Plain-NumPy oracle: x-outer / y-inner sliding window."""
    if images.ndim == 3:
        images = images[..., None]
        squeeze = True
    else:
        squeeze = False
    n, h, w, c = images.shape
    out = []
    for i in range(n):
        for x in range(0, w - patch_size + 1, stride):
            for y in range(0, h - patch_size + 1, stride):
                out.append(images[i, y:y + patch_size, x:x + patch_size])
    out = np.stack(out)
    return out[..., 0] if squeeze else out


class TestExtractPatches:
    @pytest.mark.slow
    def test_608_stride16_patch128_shapes(self):
        imgs = np.random.default_rng(0).integers(
            0, 255, size=(2, 608, 608, 3)).astype(np.float32)
        patches = geometry.extract_patches(imgs, 128, 16)
        assert patches.shape == (2 * 31 * 31, 128, 128, 3)

    def test_608_no_stride_patch32(self):
        imgs = np.random.default_rng(0).integers(
            0, 255, size=(2, 608, 608, 3)).astype(np.float32)
        patches = geometry.extract_patches(imgs, 32)
        assert patches.shape == (2 * 19 * 19, 32, 32, 3)

    def test_values_match_numpy_oracle(self):
        rng = np.random.default_rng(1)
        imgs = rng.random((3, 40, 40, 2)).astype(np.float32)
        got = np.asarray(geometry.extract_patches(imgs, 16, 8))
        want = np_extract_patches(imgs, 16, 8)
        np.testing.assert_array_equal(got, want)

    def test_values_match_numpy_oracle_3d(self):
        rng = np.random.default_rng(2)
        imgs = rng.random((2, 24, 24)).astype(np.float32)
        got = np.asarray(geometry.extract_patches(imgs, 8, 4))
        want = np_extract_patches(imgs, 8, 4)
        assert got.shape == (2 * 25, 8, 8)
        np.testing.assert_array_equal(got, want)

    def test_stride_must_cover(self):
        imgs = np.zeros((1, 100, 100, 3), np.float32)
        with pytest.raises(ValueError):
            geometry.extract_patches(imgs, 32, 16)  # (100-32) % 16 != 0

    def test_square_required(self):
        with pytest.raises(ValueError):
            geometry.extract_patches(np.zeros((1, 32, 64, 3), np.float32), 16)


class TestImagesFromPatches:
    @pytest.mark.slow
    def test_round_trip_608_stride16(self):
        rng = np.random.default_rng(3)
        imgs = rng.random((2, 608, 608, 3)).astype(np.float32)
        patches = geometry.extract_patches(imgs, 128, 16)
        patches = np.asarray(patches).reshape(2, 31 * 31, 128, 128, 3)
        recon = np.asarray(geometry.images_from_patches(patches, stride=16))
        assert recon.shape == (2, 608, 608, 3)
        np.testing.assert_allclose(recon, imgs, rtol=0, atol=1e-5)

    def test_round_trip_400_patch80_no_overlap(self):
        rng = np.random.default_rng(4)
        imgs = rng.random((2, 400, 400, 3)).astype(np.float32)
        patches = geometry.extract_patches(imgs, 80, 80)
        patches = np.asarray(patches).reshape(2, 25, 80, 80, 3)
        recon = np.asarray(geometry.images_from_patches(patches))
        assert recon.shape == (2, 400, 400, 3)
        np.testing.assert_allclose(recon, imgs, rtol=0, atol=1e-6)

    def test_overlap_average_counts(self):
        # All-ones patches must reconstruct to exactly ones everywhere,
        # proving the hit-count normalization is per-pixel correct.
        patches = np.ones((1, 9, 8, 8, 1), np.float32)
        recon = np.asarray(geometry.images_from_patches(patches, stride=4))
        assert recon.shape == (1, 16, 16, 1)
        np.testing.assert_array_equal(recon, np.ones((1, 16, 16, 1)))


class TestMirrorBorder:
    def test_matches_numpy_symmetric(self):
        rng = np.random.default_rng(5)
        imgs = rng.random((2, 10, 10, 3)).astype(np.float32)
        got = np.asarray(geometry.mirror_border(imgs, 4))
        want = np.pad(imgs, ((0, 0), (4, 4), (4, 4), (0, 0)), "symmetric")
        np.testing.assert_array_equal(got, want)

    def test_3d(self):
        imgs = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
        got = np.asarray(geometry.mirror_border(imgs, 2))
        want = np.pad(imgs, ((0, 0), (2, 2), (2, 2)), "symmetric")
        np.testing.assert_array_equal(got, want)

    def test_pad_larger_than_half(self):
        # offset 188 on 608 images: pad > image/4, must still match numpy.
        rng = np.random.default_rng(6)
        imgs = rng.random((1, 16, 16)).astype(np.float32)
        got = np.asarray(geometry.mirror_border(imgs, 12))
        want = np.pad(imgs, ((0, 0), (12, 12), (12, 12)), "symmetric")
        np.testing.assert_array_equal(got, want)


class TestQuantizeMask:
    def np_quantize(self, masks, threshold, patch_size):
        out = masks.copy()
        n, size = masks.shape[0], masks.shape[1]
        for i in range(n):
            for y in range(0, size, patch_size):
                for x in range(0, size, patch_size):
                    label = (masks[i, y:y + patch_size,
                                   x:x + patch_size, 0] >= 0.5).mean() > threshold
                    out[i, y:y + patch_size, x:x + patch_size, 0] = label
        return out

    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(7)
        masks = rng.random((3, 32, 32, 1)).astype(np.float32)
        got = np.asarray(geometry.quantize_mask(masks, 0.25, 16))
        want = self.np_quantize(masks, 0.25, 16)
        np.testing.assert_array_equal(got, want)


class TestLabelsAndBroadcast:
    def test_labels_for_patches(self):
        patches = np.stack([
            np.zeros((16, 16)), np.ones((16, 16)),
            np.full((16, 16), 0.26), np.full((16, 16), 0.24),
        ]).astype(np.float32)
        labels = np.asarray(geometry.labels_for_patches(patches))
        np.testing.assert_array_equal(labels, [0, 1, 1, 0])

    def test_predictions_to_patches(self):
        preds = np.array([0, 1, 1, 0, 1, 1, 1, 0])
        got = np.asarray(geometry.predictions_to_patches(preds, 2))
        assert got.shape == (8, 2, 2, 1)
        for i, v in enumerate(preds):
            np.testing.assert_array_equal(got[i], np.full((2, 2, 1), v))


class TestCrops:
    def test_crop_imgs_center(self):
        imgs = np.arange(1 * 10 * 10 * 1, dtype=np.float32).reshape(1, 10, 10, 1)
        got = np.asarray(geometry.crop_imgs(imgs, 4))
        np.testing.assert_array_equal(got, imgs[:, 3:7, 3:7, :])

    def test_center_crop_feature_maps(self):
        x = np.arange(1 * 8 * 8 * 2, dtype=np.float32).reshape(1, 8, 8, 2)
        got = np.asarray(geometry.center_crop(x, 4, 4))
        np.testing.assert_array_equal(got, x[:, 2:6, 2:6, :])
