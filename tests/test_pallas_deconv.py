"""A/B numerics: Pallas deconv2x2 (+ fused crop-concat) vs the XLA path.

Run in Pallas interpret mode on CPU (see conftest); the same kernels
compile for TPU hardware. The XLA oracle is exactly what the decoder
does today: ``nn.ConvTranspose`` -> ``center_crop`` -> ``concatenate``
(``models/unet.py:148-156``, reference ``src/unet.py:67-85``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from roadseg_tpu.kernels.deconv2x2 import (deconv2x2_bias, deconv2x2_dk,
                                           deconv2x2_dx, deconv2x2_fwd)
from roadseg_tpu.ops.geometry import center_crop


def xla_deconv(x, k, bias):
    out = lax.conv_transpose(
        x, k, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def xla_fused(x, k, bias, skips):
    up = xla_deconv(x, k, bias)
    h, w = up.shape[1], up.shape[2]
    return jnp.concatenate(
        [center_crop(s, h, w) for s in skips] + [up], axis=-1)


def make_inputs(n, h, w, cin, cout, skip_specs=(), seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    skips = tuple(
        jnp.asarray(rng.randn(n, hs, ws, f), jnp.float32)
        for hs, ws, f in skip_specs)
    return x, k, b, skips


SHAPES = [
    # (n, h, w, cin, cout) — even/odd rows, multi-128 channels
    (2, 8, 8, 8, 16),
    (1, 7, 9, 16, 8),          # odd rows: row tile falls back to divisors
    (1, 6, 6, 256, 128),       # multiple 128-channel tiles
]


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_forward_matches_xla(n, h, w, cin, cout):
    x, k, b, _ = make_inputs(n, h, w, cin, cout)
    got = deconv2x2_fwd(x, k, b, interpret=True)
    want = xla_deconv(x, k, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("skip_specs", [
    [(20, 20, 8)],             # one skip, crop offset (2, 2)
    [(19, 17, 8)],             # odd crop margins (floor-divided offsets)
    [(20, 20, 8), (20, 20, 8)],  # two branches (dilated config)
    [(24, 24, 128)],           # 128-channel skip: exercises the DMA path
    [(24, 24, 128), (20, 20, 8)],  # mixed DMA + blocked branches
])
def test_fused_crop_concat_matches_xla(skip_specs):
    x, k, b, skips = make_inputs(2, 8, 8, 8, 16, skip_specs)
    got = deconv2x2_fwd(x, k, b, skips, interpret=True)
    want = xla_fused(x, k, b, skips)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_dx_matches_xla_grad(n, h, w, cin, cout):
    x, k, b, _ = make_inputs(n, h, w, cin, cout)
    g = jnp.asarray(np.random.RandomState(1).randn(n, 2 * h, 2 * w, cout),
                    jnp.float32)
    want = jax.grad(lambda xx: jnp.sum(xla_deconv(xx, k, b) * g))(x)
    got = deconv2x2_dx(g, k, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_dk_matches_xla_grad(n, h, w, cin, cout):
    x, k, b, _ = make_inputs(n, h, w, cin, cout)
    g = jnp.asarray(np.random.RandomState(1).randn(n, 2 * h, 2 * w, cout),
                    jnp.float32)
    want = jax.grad(lambda kk: jnp.sum(xla_deconv(x, kk, b) * g))(k)
    got = deconv2x2_dk(x, g, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_custom_vjp_full_chain():
    """End-to-end VJP (dx, dk, db, dskips) vs XLA autodiff through the
    fused crop-concat, including a reduction consumer after the concat."""
    x, k, b, skips = make_inputs(2, 8, 8, 8, 16, [(20, 20, 8), (22, 18, 4)])
    w_mix = jnp.asarray(np.random.RandomState(2).randn(16 + 8 + 4),
                        jnp.float32)

    def loss_pallas(x, k, b, skips):
        out = deconv2x2_bias(x, k, b, skips, True)
        return jnp.sum(out * w_mix)

    def loss_xla(x, k, b, skips):
        out = xla_fused(x, k, b, skips)
        return jnp.sum(out * w_mix)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, k, b, skips)
    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, k, b, skips)
    for g1, g2 in zip(jax.tree_util.tree_leaves(got),
                      jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-4)
