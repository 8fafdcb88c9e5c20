"""Profiling: jax.profiler trace capture + per-step timing.

The reference has no profiler integration (SURVEY §5.1 — only wall-clock
iteration timing and CUDA max-mem); here trace capture is first-class so
hot spots land in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace around the wrapped block (view with
    TensorBoard's profile plugin or ui.perfetto.dev)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Robust step timing on the axon TPU relay: block_until_ready is not a
    reliable sync there, so timing closes over a device_get of a scalar."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_scalar=None) -> float:
        if sync_scalar is not None:
            jax.device_get(sync_scalar)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, batch_size: Optional[int] = None) -> str:
        if not self.times:
            return "no steps timed"
        s = f"steps={len(self.times)} mean={self.mean*1000:.1f}ms"
        if batch_size:
            s += f" throughput={batch_size/self.mean:.1f}/s"
        return s
