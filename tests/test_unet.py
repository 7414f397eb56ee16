"""U-Net model tests: size arithmetic, shapes, parameter counts, dropout.

Golden values from the reference (``src/unet.py:100-115`` and SURVEY.md §2.6):
input_size_needed(388, 5) == 572, (388, 6) == 764, (388, 4) == 476;
~31.0M params @5 layers root 64, ~124.4M @6 layers, ~212.4M @6 dilated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roadseg_tpu.models import unet


class TestSizeArithmetic:
    @pytest.mark.parametrize("output,layers,expected", [
        (388, 5, 572), (388, 6, 764), (388, 4, 476), (16, 2, 32),
    ])
    def test_input_size_needed(self, output, layers, expected):
        assert unet.input_size_needed(output, layers) == expected

    def test_invalid_default_config_rejected(self):
        # The reference flag defaults (patch_size=128, num_layers=5) are
        # invalid: the assertion fires at expand level 3 (SURVEY.md §2.6).
        with pytest.raises(ValueError):
            unet.input_size_needed(128, 5)

    @pytest.mark.parametrize("output,layers", [(388, 5), (388, 6), (16, 2),
                                               (100, 3)])
    def test_round_trip(self, output, layers):
        inp = unet.input_size_needed(output, layers)
        assert unet.output_size_for_input(inp, layers) == output


def tiny_model(**kw):
    defaults = dict(num_layers=2, root_size=4, dilated_layers=False,
                    dtype=jnp.float32)
    defaults.update(kw)
    return unet.UNet(**defaults)


class TestForwardShapes:
    def test_tiny_forward_shape(self):
        model = tiny_model()
        params = unet.init_params(model, 32, batch_size=2)
        x = jnp.zeros((2, 32, 32, 3))
        out = model.apply(params, x)
        assert out.shape == (2, 16, 16, 2)
        assert out.dtype == jnp.float32

    def test_dilated_forward_shape(self):
        model = tiny_model(dilated_layers=True)
        params = unet.init_params(model, 32, batch_size=1)
        out = model.apply(params, jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, 16, 16, 2)

    def test_three_layer_shape(self):
        model = tiny_model(num_layers=3)
        size = unet.input_size_needed(24, 3)
        params = unet.init_params(model, size)
        out = model.apply(params, jnp.zeros((1, size, size, 3)))
        assert out.shape == (1, 24, 24, 2)

    def test_jit_forward(self):
        model = tiny_model()
        params = unet.init_params(model, 32)
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        out = fwd(params, jnp.ones((1, 32, 32, 3)))
        assert out.shape == (1, 16, 16, 2)
        assert np.all(np.isfinite(np.asarray(out)))


class TestParamCounts:
    @staticmethod
    def reference_param_count(num_layers, root_size, dilated):
        """Analytic count mirroring the reference channel plan."""
        total = 3 * 1 * 1 * 3 + 3  # color_space_adjust
        cin = 3
        f = root_size
        enc_out = []
        for _ in range(num_layers):
            if dilated:
                total += (9 * cin * f + f) + (9 * f * f + f)
            total += (9 * cin * f + f) + (9 * f * f + f)
            enc_out.append(f)
            cin = f
            f *= 2
        f //= 2          # bottom features
        cin = f
        for i in range(num_layers - 1):
            f //= 2
            total += 2 * 2 * cin * f + f  # transpose conv
            skip = enc_out[num_layers - 2 - i]
            concat = f + skip * (2 if dilated else 1)
            total += (9 * concat * f + f) + (9 * f * f + f)
            cin = f
        total += 1 * 1 * f * 2 + 2  # head
        return total

    @pytest.mark.parametrize("layers,dilated,approx_millions", [
        (5, False, 31.0), (6, False, 124.4), (6, True, 212.4),
    ])
    def test_flagship_param_counts(self, layers, dilated, approx_millions):
        # Analytic only (instantiating 212M params in a unit test is slow);
        # the analytic formula is itself validated against real params below.
        n = self.reference_param_count(layers, 64, dilated)
        assert abs(n / 1e6 - approx_millions) < 0.5

    @pytest.mark.parametrize("layers,root,dilated", [
        (2, 4, False), (2, 4, True),
        pytest.param(3, 8, False, marks=pytest.mark.slow),
    ])
    def test_analytic_matches_actual(self, layers, root, dilated):
        model = unet.UNet(num_layers=layers, root_size=root,
                          dilated_layers=dilated, dtype=jnp.float32)
        size = unet.input_size_needed(16, 2) if layers == 2 else \
            unet.input_size_needed(24, 3)
        params = unet.init_params(model, size)
        assert unet.count_params(params) == \
            self.reference_param_count(layers, root, dilated)


class TestDropout:
    def test_deterministic_ignores_dropout(self):
        model = tiny_model()
        params = unet.init_params(model, 32)
        x = jnp.ones((1, 32, 32, 3))
        a = model.apply(params, x, dropout_keep=0.5, deterministic=True)
        b = model.apply(params, x, dropout_keep=1.0, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_training_dropout_is_stochastic(self):
        model = tiny_model()
        params = unet.init_params(model, 32)
        x = jnp.ones((1, 32, 32, 3))
        a = model.apply(params, x, dropout_keep=0.5, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(0)})
        b = model.apply(params, x, dropout_keep=0.5, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_keep_one_is_identity(self):
        model = tiny_model()
        params = unet.init_params(model, 32)
        x = jnp.ones((1, 32, 32, 3))
        a = model.apply(params, x, dropout_keep=1.0, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(0)})
        b = model.apply(params, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTranslationEquivariance:
    def test_fully_convolutional(self):
        """A valid-conv U-Net (no padding anywhere) applied to a larger
        input must reproduce the smaller-input output on the aligned
        region — the property the sliding-window inference relies on."""
        model = tiny_model()
        params = unet.init_params(model, 32)
        rng = np.random.default_rng(0)
        big = rng.random((1, 48, 48, 3)).astype(np.float32)
        small = big[:, :32, :32, :]
        out_small = np.asarray(model.apply(params, jnp.asarray(small)))
        out_big = np.asarray(model.apply(params, jnp.asarray(big)))
        np.testing.assert_allclose(out_small, out_big[:, :16, :16, :],
                                   atol=2e-4)
