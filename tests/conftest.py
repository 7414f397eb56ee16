"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); the real TPU is exercised by
``bench.py`` / the driver, not the unit tests.

Note: this image preloads jax with the axon TPU backend via sitecustomize,
so env vars alone are too late — we also flip ``jax_platforms`` through the
config API before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, (
    "tests expect 8 virtual CPU devices; backend was initialized too early")
