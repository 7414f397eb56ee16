"""Tracing/profiling aux subsystem.

The reference has only wall-clock prints around prediction
(``tf_aerial_images.py:450-453``, ``run.py:168-171``). TPU-native
observability goes further:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA ops, fusion, HBM traffic).
* ``StepTimer`` — cheap rolling step-time / throughput stats that do not
  force device syncs (call ``.tick()`` after dispatch; it measures host
  wall clock between dispatches, and ``block()`` once at the end).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """Profile the enclosed block with the JAX/XLA profiler."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {logdir}")


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._count = 0
        self._elapsed = 0.0

    def tick(self):
        now = time.perf_counter()
        if self._t0 is not None:
            self._elapsed += now - self._t0
            self._count += 1
        self._t0 = now

    @property
    def steps_per_sec(self) -> float:
        return self._count / self._elapsed if self._elapsed else 0.0

    @property
    def mean_step_ms(self) -> float:
        return 1e3 * self._elapsed / self._count if self._count else 0.0

    def summary(self) -> str:
        return (f"{self._count} steps, {self.mean_step_ms:.1f} ms/step, "
                f"{self.steps_per_sec:.2f} steps/s")
