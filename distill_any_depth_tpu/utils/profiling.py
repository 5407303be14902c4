"""Profiling and step-timing instrumentation.

The reference has only wall-clock log lines (train_distillation.py:
1598-1608); here tracing is a first-class module (SURVEY.md §5): a
``jax.profiler`` trace context for TensorBoard-readable device traces, and a
``StepTimer`` that reports steps/sec and images/sec with device sync.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["trace", "StepTimer", "device_sync"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/profile'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Block until ``x`` (array/pytree) is computed.

    On tunneled remote backends ``block_until_ready`` can return before
    completion; fetching a scalar forces a real sync.
    """
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        jax.device_get(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel") else leaves[0])


@dataclass
class StepTimer:
    """Rolling step timing: ``timer.tick(batch_size)`` after each step."""

    window: int = 50
    _times: list = field(default_factory=list)
    _images: list = field(default_factory=list)
    _last: float | None = None

    def tick(self, batch_size: int = 1) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._images.append(batch_size)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._images.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def images_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return sum(self._images) / sum(self._times)
