"""TTA ensemble and stochastic augmentation tests."""

import jax
import numpy as np

from roadseg_tpu.ops import augment


class TestEnsemble:
    def test_forward_matches_numpy(self):
        rng = np.random.default_rng(0)
        imgs = rng.random((3, 12, 12, 3)).astype(np.float32)
        got = np.asarray(augment.image_augmentation_ensemble(imgs))
        assert got.shape == (18, 12, 12, 3)
        np.testing.assert_array_equal(got[0:3], imgs)
        np.testing.assert_array_equal(got[3:6], np.flip(imgs, axis=2))
        np.testing.assert_array_equal(got[6:9], np.flip(imgs, axis=1))
        for i, k in enumerate([1, 2, 3]):
            np.testing.assert_array_equal(
                got[(3 + i) * 3:(4 + i) * 3], np.rot90(imgs, k=k, axes=(1, 2)))

    def test_invert_round_trip(self):
        # predicting the identity function: invert(ensemble(x)) == x
        rng = np.random.default_rng(1)
        masks = rng.random((2, 10, 10)).astype(np.float32)
        ens = augment.image_augmentation_ensemble(masks[..., None])[..., 0]
        rec = np.asarray(augment.invert_image_augmentation_ensemble(ens))
        np.testing.assert_allclose(rec, masks, atol=1e-6)

    def test_invert_4d_masks(self):
        rng = np.random.default_rng(2)
        masks = rng.random((1, 8, 8, 1)).astype(np.float32)
        ens = augment.image_augmentation_ensemble(masks)
        rec = np.asarray(augment.invert_image_augmentation_ensemble(ens))
        np.testing.assert_allclose(rec, masks, atol=1e-6)


class TestRot90Batch:
    def test_all_k_match_numpy(self):
        rng = np.random.default_rng(3)
        x = rng.random((4, 6, 6, 2)).astype(np.float32)
        k = np.array([0, 1, 2, 3])
        got = np.asarray(augment._rot90_batch(jax.numpy.asarray(x),
                                              jax.numpy.asarray(k)))
        for i in range(4):
            want = np.rot90(x[i], k=k[i], axes=(0, 1))
            np.testing.assert_array_equal(got[i], want)


class TestStochasticAugment:
    def test_img_mask_consistency(self):
        # Masks must receive exactly the same spatial transform as images.
        # Use an image whose channel 0 equals the mask so they stay equal.
        rng = np.random.default_rng(4)
        mask = (rng.random((8, 16, 16)) > 0.5).astype(np.float32)
        imgs = np.repeat(mask[..., None], 3, axis=-1)
        key = jax.random.PRNGKey(0)
        out_imgs, out_masks = augment.stochastic_augment(key, imgs, mask)
        np.testing.assert_array_equal(np.asarray(out_imgs[..., 0]),
                                      np.asarray(out_masks))

    def test_preserves_pixel_multiset(self):
        rng = np.random.default_rng(5)
        imgs = rng.random((4, 8, 8, 3)).astype(np.float32)
        mask = rng.random((4, 8, 8)).astype(np.float32)
        out_imgs, out_masks = augment.stochastic_augment(
            jax.random.PRNGKey(7), imgs, mask)
        # flips/transposes/rotations permute pixels within each sample
        np.testing.assert_allclose(
            np.sort(np.asarray(out_imgs).reshape(4, -1), axis=1),
            np.sort(imgs.reshape(4, -1), axis=1), atol=0)
        np.testing.assert_allclose(
            np.sort(np.asarray(out_masks).reshape(4, -1), axis=1),
            np.sort(mask.reshape(4, -1), axis=1), atol=0)

    def test_different_keys_differ(self):
        imgs = np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
        mask = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
        a = augment.stochastic_augment(jax.random.PRNGKey(0), imgs, mask)
        b = augment.stochastic_augment(jax.random.PRNGKey(123), imgs, mask)
        assert not (np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
                    and np.array_equal(np.asarray(a[1]), np.asarray(b[1])))
