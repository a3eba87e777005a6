"""Profiling/tracing hooks (first-class, unlike the reference —
SURVEY.md §5 notes the reference ships no profiler integration).

* ``trace(dir)`` — context manager around ``jax.profiler`` producing an
  xplane trace viewable in TensorBoard/XProf.
* ``StepTimer`` — rolling steps/sec + images/sec with compile-step
  exclusion.
* ``device_memory_stats()`` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks steps/sec, skipping the first (compile) step."""

    def __init__(self, batch_size: Optional[int] = None, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._times = []
        self._last = None
        self._steps = 0

    def tick(self):
        now = time.perf_counter()
        self._steps += 1
        if self._last is not None and self._steps > 1:  # skip compile step
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def images_per_sec(self) -> float:
        if self.batch_size is None:
            return 0.0
        return self.steps_per_sec * self.batch_size

    def summary(self) -> Dict[str, float]:
        out = {"steps_per_sec": round(self.steps_per_sec, 3)}
        if self.batch_size:
            out["images_per_sec"] = round(self.images_per_sec, 1)
        return out


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    stats = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use", -1),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use", -1),
                "bytes_limit": ms.get("bytes_limit", -1),
            }
        except Exception:
            stats[str(d)] = {}
    return stats
