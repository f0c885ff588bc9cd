"""Profiling hooks: jax.profiler traces + step timing.

The reference's only tracing is wall-clock AverageMeters (trainer.py:325)
and a stray torch.cuda.memory_summary() per text forward (model.py:332-333,
dropped). Here: opt-in XLA profiler traces viewable in TensorBoard/XProf,
a step-timer context, and device memory stats."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture an XLA profiler trace into logdir (no-op when logdir falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing of jitted steps (call result.block_until_ready()
    yourself or pass block=True to time the device work, not the dispatch)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats(device=None) -> Dict[str, int]:
    """bytes_in_use / peak_bytes_in_use etc. for one device (if supported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
