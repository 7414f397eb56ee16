"""Persistent XLA compilation cache.

The flagship programs (764x764 6-layer dilated train step / 54-patch
ensemble predict) take tens of seconds to compile; caching compiled
executables on disk makes every CLI / run.py / bench / serve restart
near-instant after the first run on a given machine.

Enabled by ``Engine`` at construction (idempotent). Controls:
  ROADSEG_CACHE_DIR   override the cache location
                      (default ~/.cache/roadseg_tpu/xla)
  ROADSEG_NO_CACHE=1  disable entirely
"""

from __future__ import annotations

import os

_enabled = False
_cache_dir: str | None = None


def enable_persistent_cache() -> str | None:
    """Idempotently point JAX's compilation cache at a persistent dir.

    Returns the ACTIVE cache dir (the one configured on first call — JAX's
    cache dir is process-global, so later env changes don't move it), or
    None when disabled/unsupported.
    """
    global _enabled, _cache_dir
    if os.environ.get("ROADSEG_NO_CACHE") == "1":
        return None
    import jax

    if _enabled:
        return _cache_dir
    cache_dir = os.environ.get(
        "ROADSEG_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "roadseg_tpu",
                     "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: tiny test programs compile in <1s but the
        # defaults would skip them, making the behavior look flaky
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - old jax without the knobs
        print(f"persistent compilation cache unavailable: {e}")
        return None
    _enabled = True
    _cache_dir = cache_dir
    return cache_dir
