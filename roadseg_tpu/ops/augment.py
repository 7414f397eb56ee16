"""On-device augmentation: test-time ensemble and in-graph stochastic transforms.

Replaces:

* ``image_augmentation_ensemble`` / ``invert_image_augmentation_ensemble``
  (``src/images.py:376-417``) — host NumPy 6-way test-time augmentation.
* ``ConvolutionalModel.stochastic_images_augmentation``
  (``src/tf_aerial_images.py:173-210``) — per-sample random flips/transpose/
  rot90 built into the TF graph.

Note on parity: the reference's ``stochastic_transform`` ignores its
``transform`` argument and always applies ``flip_up_down`` (three independent
ud-flip coins; ``tf_aerial_images.py:186-191``). We implement the *intended*
behaviour documented in the report (flip-ud, flip-lr, transpose, k*90deg) —
the divergence does not affect mask-level parity, which is evaluated on the
(deterministic) inference path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The 6 test-time-augmentation variants, in reference order:
# identity, flip-lr (axis 2), flip-ud (axis 1), rot90 k=1,2,3 over axes (1,2).
ENSEMBLE_SIZE = 6


def image_augmentation_ensemble(imgs):
    """[N, H, W, C] -> [6N, H, W, C]: id, fliplr, flipud, rot90 k=1..3."""
    imgs = jnp.asarray(imgs)
    variants = [
        imgs,
        jnp.flip(imgs, axis=2),
        jnp.flip(imgs, axis=1),
        jnp.rot90(imgs, k=1, axes=(1, 2)),
        jnp.rot90(imgs, k=2, axes=(1, 2)),
        jnp.rot90(imgs, k=3, axes=(1, 2)),
    ]
    return jnp.concatenate(variants, axis=0)


def invert_image_augmentation_ensemble(masks):
    """[6N, H, W(, C)] prediction masks -> averaged [N, H, W(, C)].

    Un-flips / un-rotates each variant, then means over the 6
    (``images.py:399-417``).
    """
    masks = jnp.asarray(masks)
    if masks.shape[0] % ENSEMBLE_SIZE != 0:
        raise ValueError("mask count must be a multiple of 6")
    n = masks.shape[0] // ENSEMBLE_SIZE
    chunks = [masks[i * n:(i + 1) * n] for i in range(ENSEMBLE_SIZE)]
    total = (
        chunks[0]
        + jnp.flip(chunks[1], axis=2)
        + jnp.flip(chunks[2], axis=1)
        + jnp.rot90(chunks[3], k=-1, axes=(1, 2))
        + jnp.rot90(chunks[4], k=-2, axes=(1, 2))
        + jnp.rot90(chunks[5], k=-3, axes=(1, 2))
    )
    return total / ENSEMBLE_SIZE


def _batched_where(cond, a, b):
    """Select per-sample between two [N, H, W, C] tensors."""
    return jnp.where(cond[:, None, None, None], a, b)


def _rot90_batch(x, k):
    """Per-sample rot90 over axes (1, 2) by per-sample k in {0,1,2,3}.

    Decomposed into vectorized flips/transpose so no lax.switch / gather of
    4 full copies is needed:
      rot90^1 = flip_y o transpose ; rot90^2 = flip_y o flip_x.
    """
    # Apply rot180 where k >= 2, then rot90 where k is odd.
    k = k.astype(jnp.int32)
    do180 = k >= 2
    x = _batched_where(do180, jnp.flip(x, axis=(1, 2)), x)
    do90 = (k % 2) == 1
    # np.rot90(m, 1, axes=(1,2)): out[y, x] = in[x, W-1-y]  == flip_y(transpose)
    rot1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
    return _batched_where(do90, rot1, x)


def stochastic_augment(rng: jax.Array, imgs, masks):
    """Per-sample random flip-ud / flip-lr / transpose (p=0.5 each) plus a
    random k*90deg rotation, applied identically to images and masks.

    imgs: [B, Hi, Wi, C] float; masks: [B, Hm, Wm] (any numeric dtype).
    Returns transformed (imgs, masks). Requires square spatial dims (the
    transpose), which holds for U-Net patches.
    """
    imgs = jnp.asarray(imgs)
    masks = jnp.asarray(masks)[..., None]
    b = imgs.shape[0]
    k_ud, k_lr, k_tr, k_rot = jax.random.split(rng, 4)

    def coin(key):
        return jax.random.uniform(key, (b,)) > 0.5

    flip_ud = coin(k_ud)
    imgs = _batched_where(flip_ud, jnp.flip(imgs, axis=1), imgs)
    masks = _batched_where(flip_ud, jnp.flip(masks, axis=1), masks)

    flip_lr = coin(k_lr)
    imgs = _batched_where(flip_lr, jnp.flip(imgs, axis=2), imgs)
    masks = _batched_where(flip_lr, jnp.flip(masks, axis=2), masks)

    transpose = coin(k_tr)
    imgs = _batched_where(transpose, jnp.swapaxes(imgs, 1, 2), imgs)
    masks = _batched_where(transpose, jnp.swapaxes(masks, 1, 2), masks)

    # floor(U[0,1) * 4) in {0,1,2,3} like tf_aerial_images.py:199-200
    k = jnp.floor(jax.random.uniform(k_rot, (b,)) * 4).astype(jnp.int32)
    imgs = _rot90_batch(imgs, k)
    masks = _rot90_batch(masks, k)

    return imgs, masks[..., 0]
