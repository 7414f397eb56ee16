"""The "pad8" conv backend: valid convs run over an end-padded domain so
their output spatial dims land on multiples of 8 (vreg sublanes), then
slice back. The kept outputs only ever see real inputs, so the backend
must be numerically exact vs plain XLA — forward and backward.

Motivation: SCALING.md's roofline puts the measured train step ~2.6x above
its floor with tiling of odd valid-conv sizes (571, 285, ...) as the gap;
this is the zero-copy alignment experiment (pad via the conv's own padding
config, not a pad op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_unet_pad8_backend_matches_xla_exactly():
    """Full-model A/B at a size where every conv output is unaligned."""
    from roadseg_tpu.models.unet import UNet, init_params

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 52, 52, 3), jnp.float32)
    m_x = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="xla")
    m_p = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="pad8")
    params = init_params(m_x, 52)

    out_x = m_x.apply(params, x, deterministic=True)
    out_p = m_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x, deterministic=True) ** 2)
        return f
    g_x = jax.grad(loss(m_x))(params)
    g_p = jax.grad(loss(m_p))(params)
    for (path, vx), vp in zip(jax.tree_util.tree_leaves_with_path(g_x),
                              jax.tree.leaves(g_p)):
        np.testing.assert_allclose(
            vp, vx, rtol=1e-5, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pad8_dilated_conv_matches_xla():
    """The dilated branches (rhs_dilation 2/4) pad by 2*dilation; exactness
    must hold there too."""
    import flax.linen as nn

    from roadseg_tpu.ops.conv import conv2d_valid

    class One(nn.Module):
        impl: str
        dilation: int

        @nn.compact
        def __call__(self, x):
            return conv2d_valid(self, x, 8, name="c", dtype=jnp.float32,
                                impl=self.impl, dilation=self.dilation,
                                relu=True)

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(1, 21, 19, 4), jnp.float32)
    for dilation in (1, 2, 4):
        m_x = One(impl="xla", dilation=dilation)
        m_p = One(impl="pad8", dilation=dilation)
        p = m_x.init({"params": jax.random.PRNGKey(0)}, x)
        np.testing.assert_allclose(m_p.apply(p, x), m_x.apply(p, x),
                                   rtol=1e-6, atol=1e-6)


def test_pad8_already_aligned_is_plain_valid_conv():
    """When the output is already 8-aligned, pad8 adds nothing (no slice)."""
    import flax.linen as nn

    from roadseg_tpu.ops.conv import conv2d_valid

    class One(nn.Module):
        impl: str

        @nn.compact
        def __call__(self, x):
            return conv2d_valid(self, x, 8, name="c", dtype=jnp.float32,
                                impl=self.impl)

    x = jnp.zeros((1, 10, 18, 4), jnp.float32)  # outputs 8 x 16
    m = One(impl="pad8")
    p = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(p, x)
    assert out.shape == (1, 8, 16, 8)
