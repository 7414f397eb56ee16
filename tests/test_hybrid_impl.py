"""The "hybrid" conv backend: measured per-shape dispatch between XLA and
the Pallas kernels (docs/DESIGN.md round-3 bench table).

Rule under test (ops/conv.py, models/unet.py):
* 3x3 convs -> Pallas only for bottleneck channel widths (cin >= 1024),
* deconv2x2+crop-concat -> always Pallas,
* 1x1 convs -> always XLA.
Off-TPU the Pallas legs run in interpret mode via ROADSEG_PALLAS_INTERPRET=1
(same CI harness as tests/test_pallas_conv.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_unet_hybrid_backend_matches_xla(monkeypatch):
    """Full-model A/B: conv_impl='hybrid' (interpret) vs 'xla'."""
    monkeypatch.setenv("ROADSEG_PALLAS_INTERPRET", "1")
    from roadseg_tpu.models.unet import UNet, init_params

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 52, 52, 3), jnp.float32)
    m_x = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="xla")
    m_h = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="hybrid")
    params = init_params(m_x, 52)

    out_x = m_x.apply(params, x, deterministic=True)
    out_h = m_h.apply(params, x, deterministic=True)
    np.testing.assert_allclose(out_h, out_x, rtol=1e-4, atol=1e-4)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x, deterministic=True) ** 2)
        return f
    g_x = jax.grad(loss(m_x))(params)
    g_h = jax.grad(loss(m_h))(params)
    for (path, vx), vh in zip(jax.tree_util.tree_leaves_with_path(g_x),
                              jax.tree.leaves(g_h)):
        np.testing.assert_allclose(
            vh, vx, rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_hybrid_dispatch_rule(monkeypatch):
    """hybrid sends sub-1024-channel 3x3s and all 1x1s to XLA, every
    deconv block to the Pallas kernel, and >=1024-channel 3x3s to the
    Pallas conv3x3 kernel."""
    monkeypatch.setenv("ROADSEG_PALLAS_INTERPRET", "1")
    import roadseg_tpu.kernels.conv1x1 as k1
    import roadseg_tpu.kernels.conv3x3 as k3
    import roadseg_tpu.kernels.deconv2x2 as kd

    calls = {"conv3x3": 0, "deconv": 0, "conv1x1": 0}
    real3, reald, real1 = k3.conv3x3_bias, kd.deconv2x2_bias, k1.conv1x1_bias

    def wrap(name, fn):
        def inner(*a, **kw):
            calls[name] += 1
            return fn(*a, **kw)
        return inner

    monkeypatch.setattr(k3, "conv3x3_bias", wrap("conv3x3", real3))
    monkeypatch.setattr(kd, "deconv2x2_bias", wrap("deconv", reald))
    monkeypatch.setattr(k1, "conv1x1_bias", wrap("conv1x1", real1))

    from roadseg_tpu.models.unet import UNet, init_params
    m = UNet(num_layers=2, root_size=8, dilated_layers=False,
             dtype=jnp.float32, conv_impl="hybrid")
    params = init_params(m, 52)
    calls.update({"conv3x3": 0, "deconv": 0, "conv1x1": 0})  # init traced once
    m.apply(params, jnp.zeros((1, 52, 52, 3), jnp.float32),
            deterministic=True)
    # root 8, 2 layers: channel widths 8/16 — all 3x3s below the 1024
    # bottleneck threshold; one decoder block; two 1x1s (color, head)
    assert calls == {"conv3x3": 0, "deconv": 1, "conv1x1": 0}

    # a 1024-channel input hits the Pallas conv3x3 leg under hybrid
    from roadseg_tpu.ops.conv import conv2d_valid
    import flax.linen as nn

    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv2d_valid(self, x, 8, name="c", dtype=jnp.float32,
                                impl="hybrid")

    mod = One()
    xwide = jnp.zeros((1, 6, 6, 1024), jnp.float32)
    p = mod.init({"params": jax.random.PRNGKey(0)}, xwide)
    calls["conv3x3"] = 0  # init traced once
    mod.apply(p, xwide)
    assert calls["conv3x3"] == 1


@pytest.mark.slow
def test_unet_hybrid_deconv_backend(monkeypatch):
    """conv_impl='hybrid_deconv': Pallas ONLY for the fused
    deconv2x2+crop-concat (the per-shape win with no backward cost and
    one custom call per decoder level); every conv — including >=1024-
    channel bottlenecks — stays on XLA. Full-model A/B vs 'xla' plus the
    dispatch-count rule."""
    monkeypatch.setenv("ROADSEG_PALLAS_INTERPRET", "1")
    import roadseg_tpu.kernels.conv1x1 as k1
    import roadseg_tpu.kernels.conv3x3 as k3
    import roadseg_tpu.kernels.deconv2x2 as kd
    from roadseg_tpu.models.unet import UNet, init_params

    calls = {"conv3x3": 0, "deconv": 0, "conv1x1": 0}
    real3, reald, real1 = k3.conv3x3_bias, kd.deconv2x2_bias, k1.conv1x1_bias

    def wrap(name, fn):
        def inner(*a, **kw):
            calls[name] += 1
            return fn(*a, **kw)
        return inner

    monkeypatch.setattr(k3, "conv3x3_bias", wrap("conv3x3", real3))
    monkeypatch.setattr(kd, "deconv2x2_bias", wrap("deconv", reald))
    monkeypatch.setattr(k1, "conv1x1_bias", wrap("conv1x1", real1))

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 52, 52, 3), jnp.float32)
    m_x = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="xla")
    m_d = UNet(num_layers=2, root_size=8, dilated_layers=False,
               dtype=jnp.float32, conv_impl="hybrid_deconv")
    params = init_params(m_x, 52)
    calls.update({"conv3x3": 0, "deconv": 0, "conv1x1": 0})
    out_x = m_x.apply(params, x, deterministic=True)
    out_d = m_d.apply(params, x, deterministic=True)
    np.testing.assert_allclose(out_d, out_x, rtol=1e-4, atol=1e-4)
    assert calls == {"conv3x3": 0, "deconv": 1, "conv1x1": 0}

    # bottleneck-width 3x3 stays on XLA under hybrid_deconv (the exact
    # shape class 'hybrid' would dispatch to Pallas)
    from roadseg_tpu.ops.conv import conv2d_valid
    import flax.linen as nn

    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv2d_valid(self, x, 8, name="c", dtype=jnp.float32,
                                impl="hybrid_deconv")

    mod = One()
    xwide = jnp.zeros((1, 6, 6, 1024), jnp.float32)
    p = mod.init({"params": jax.random.PRNGKey(0)}, xwide)
    calls["conv3x3"] = 0
    mod.apply(p, xwide)
    assert calls["conv3x3"] == 0
