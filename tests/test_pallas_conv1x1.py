"""A/B numerics: Pallas conv1x1 (fused channel matmul + bias) vs XLA.

Run in Pallas interpret mode on CPU (see conftest); the same kernel
compiles for TPU hardware. Covers the real-model shapes: the 3->3
color_space_adjust mix and the Cin->2 logit head (``src/unet.py:22,95``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roadseg_tpu.kernels.conv1x1 import conv1x1_bias, conv1x1_dw, conv1x1_fwd


def xla_conv1x1(x, k, bias):
    return jnp.einsum("bhwc,cf->bhwf", x, k) + bias


def make_inputs(n, h, w, cin, cout, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    return x, k, b


SHAPES = [
    (2, 16, 16, 8, 16),
    (1, 13, 9, 3, 3),          # color_space_adjust shape class (+ragged)
    (2, 20, 20, 64, 2),        # the logit head shape class
    (1, 40, 33, 256, 128),     # multi-128 tiles, rows chunked
    (1, 52, 52, 3, 3),         # ragged row chunks (39+13): masked partial
]


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_forward_matches_xla(n, h, w, cin, cout):
    x, k, b = make_inputs(n, h, w, cin, cout)
    got = conv1x1_fwd(x, k, b, interpret=True)
    want = xla_conv1x1(x, k, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_dw_matches_xla_grad(n, h, w, cin, cout):
    x, k, b = make_inputs(n, h, w, cin, cout)
    g = jnp.asarray(np.random.RandomState(1).randn(n, h, w, cout),
                    jnp.float32)
    want = jax.grad(lambda kk: jnp.sum(xla_conv1x1(x, kk, b) * g))(k)
    got = conv1x1_dw(x, g, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_custom_vjp_full_chain():
    x, k, b = make_inputs(2, 12, 12, 16, 8)
    g = jnp.asarray(np.random.RandomState(2).randn(2, 12, 12, 8),
                    jnp.float32)

    def loss_pallas(x, k, b):
        return jnp.sum(conv1x1_bias(x, k, b, True) * g)

    def loss_xla(x, k, b):
        return jnp.sum(xla_conv1x1(x, k, b) * g)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for g1, g2 in zip(got, want):
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-4)
