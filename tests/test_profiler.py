"""Profiler subsystem smoke tests (CPU)."""

import glob
import os

import jax.numpy as jnp

from roadseg_tpu.utils.profiler import StepTimer, trace


def test_step_timer():
    t = StepTimer()
    t.tick()
    for _ in range(3):
        jnp.ones((8, 8)).sum().block_until_ready()
        t.tick()
    assert t.mean_step_ms >= 0.0
    assert t.steps_per_sec > 0.0
    assert "3 steps" in t.summary()


def test_trace_disabled_noop(tmp_path):
    with trace(str(tmp_path), enabled=False):
        pass
    assert not os.listdir(tmp_path)


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path), enabled=True):
        jnp.ones((64, 64)).sum().block_until_ready()
    # jax profiler writes plugins/profile/<ts>/*.trace.json.gz or xplane
    found = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found)
