"""Persistent compilation cache wiring."""

import glob
import os

import jax
import jax.numpy as jnp

from roadseg_tpu.utils.cache import enable_persistent_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    monkeypatch.setenv("ROADSEG_CACHE_DIR", str(tmp_path))
    import roadseg_tpu.utils.cache as cache_mod
    monkeypatch.setattr(cache_mod, "_enabled", False)
    assert enable_persistent_cache() == str(tmp_path)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)

    @jax.jit
    def f(x):
        return (x @ x.T).sum()

    f(jnp.ones((64, 64))).block_until_ready()
    # JAX's persistent cache only writes entries for TPU/GPU backends; the
    # unit suite runs on the virtual CPU mesh, so population is asserted
    # only when a real accelerator is present (verified manually on v5e).
    if jax.default_backend() in ("tpu", "gpu"):
        assert glob.glob(os.path.join(str(tmp_path), "*")), \
            "compilation cache dir stayed empty"


def test_cache_disabled(monkeypatch):
    monkeypatch.setenv("ROADSEG_NO_CACHE", "1")
    import roadseg_tpu.utils.cache as cache_mod
    monkeypatch.setattr(cache_mod, "_enabled", False)
    assert enable_persistent_cache() is None
