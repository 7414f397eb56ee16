"""A/B numerics: Pallas conv3x3 kernels vs the XLA reference path.

Run in Pallas interpret mode on CPU (see conftest); the same kernels
compile for TPU hardware (exercised by bench/verify on the real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from roadseg_tpu.kernels.conv3x3 import conv3x3_bias, conv3x3_dw, conv3x3_fwd


def xla_conv(x, k, bias, dilation=1):
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out + bias


def make_inputs(n, h, w, cin, cout, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, cin), dtype)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, dtype)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    return x, k, b


SHAPES = [
    # (n, h, w, cin, cout, dilation) — divisible and ragged rows, multi
    # channel tiles, both dilations
    (2, 26, 26, 8, 16, 1),
    (1, 21, 33, 16, 8, 1),     # ragged h_out=19 vs row_tile 8
    (2, 20, 20, 8, 16, 2),     # dilated
    (1, 17, 19, 4, 4, 2),      # ragged + dilated
    (1, 12, 12, 256, 128, 1),  # multiple 128-channel tiles
]


@pytest.mark.parametrize("n,h,w,cin,cout,d", SHAPES)
def test_forward_matches_xla(n, h, w, cin, cout, d):
    x, k, b = make_inputs(n, h, w, cin, cout)
    got = conv3x3_fwd(x, k, b, dilation=d, interpret=True)
    want = xla_conv(x, k, b, dilation=d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("n,h,w,cin,cout,d", SHAPES)
def test_dw_matches_xla(n, h, w, cin, cout, d):
    x, k, b = make_inputs(n, h, w, cin, cout)
    h_out, w_out = h - 2 * d, w - 2 * d
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(n, h_out, w_out, cout), jnp.float32)

    def f(kk):
        return jnp.sum(xla_conv(x, kk, b, dilation=d) * g)
    want = jax.grad(f)(k)
    got = conv3x3_dw(x, g, dilation=d, interpret=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("n,h,w,cin,cout,d", SHAPES[:4])
def test_custom_vjp_matches_xla_grads(n, h, w, cin, cout, d):
    x, k, b = make_inputs(n, h, w, cin, cout)
    h_out, w_out = h - 2 * d, w - 2 * d
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(n, h_out, w_out, cout), jnp.float32)

    def loss_pallas(x, k, b):
        return jnp.sum(conv3x3_bias(x, k, b, d, True) * g)

    def loss_xla(x, k, b):
        return jnp.sum(xla_conv(x, k, b, dilation=d) * g)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for gv, wv, name in zip(got, want, "x k b".split()):
        np.testing.assert_allclose(gv, wv, rtol=1e-4, atol=1e-3,
                                   err_msg=f"d{name}")


def test_bf16_forward_close_to_f32():
    x, k, b = make_inputs(1, 20, 20, 16, 16, dtype=jnp.float32)
    f32 = conv3x3_fwd(x, k, b, interpret=True)
    bf = conv3x3_fwd(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), b,
                     interpret=True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32), f32,
                               rtol=0.05, atol=0.1)


@pytest.mark.slow
def test_unet_pallas_backend_matches_xla(monkeypatch):
    """Full model A/B: conv_impl='pallas' (interpret) vs 'xla' — forward
    and gradients agree."""
    monkeypatch.setenv("ROADSEG_PALLAS_INTERPRET", "1")
    from roadseg_tpu.models.unet import UNet, init_params

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 52, 52, 3), jnp.float32)
    m_x = UNet(num_layers=2, root_size=8, dilated_layers=True,
               dtype=jnp.float32, conv_impl="xla")
    m_p = UNet(num_layers=2, root_size=8, dilated_layers=True,
               dtype=jnp.float32, conv_impl="pallas")
    params = init_params(m_x, 52)

    out_x = m_x.apply(params, x, deterministic=True)
    out_p = m_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x, deterministic=True) ** 2)
        return f
    g_x = jax.grad(loss(m_x))(params)
    g_p = jax.grad(loss(m_p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree.leaves(g_p)
    for (path, vx), vp in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            vp, vx, rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
@pytest.mark.parametrize("d", [1, 2])
def test_fused_relu_forward_and_grads(d):
    x, k, b = make_inputs(1, 20, 24, 8, 8, seed=5)
    h_out, w_out = 20 - 2 * d, 24 - 2 * d
    rng = np.random.RandomState(6)
    g = jnp.asarray(rng.randn(1, h_out, w_out, 8), jnp.float32)

    def loss_pallas(x, k, b):
        return jnp.sum(conv3x3_bias(x, k, b, d, True, True) * g)

    def loss_xla(x, k, b):
        return jnp.sum(jax.nn.relu(xla_conv(x, k, b, dilation=d)) * g)

    got_out = conv3x3_bias(x, k, b, d, True, True)
    want_out = jax.nn.relu(xla_conv(x, k, b, dilation=d))
    np.testing.assert_allclose(got_out, want_out, rtol=1e-5, atol=1e-4)
    assert float(got_out.min()) == 0.0  # relu actually clips

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for gv, wv, name in zip(got, want, "x k b".split()):
        np.testing.assert_allclose(gv, wv, rtol=1e-4, atol=1e-3,
                                   err_msg=f"d{name}")
