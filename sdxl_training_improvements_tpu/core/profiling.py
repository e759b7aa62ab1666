"""Throughput monitoring + TPU profiler hooks.

Counterpart of reference ``ThroughputMonitor`` (``src/core/memory/
throughput.py``: windowed samples/sec + batch-time metrics) plus the real
profiler integration the reference lacks (SURVEY.md §5.1): ``jax.profiler``
trace capture around training steps, and device-memory stats in place of
``torch.cuda`` polling.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax
import numpy as np


class ThroughputMonitor:
    """Windowed samples/sec + batch-time (``throughput.py:19-92``)."""

    def __init__(self, window_size: int = 100, batch_size: int = 1):
        self.window_size = window_size
        self.batch_size = batch_size
        # (duration, samples) per batch so per-call batch_size overrides
        # feed the rate, not just the lifetime counter
        self.batch_times: deque = deque(maxlen=window_size)
        self._start: Optional[float] = None
        self.total_samples = 0

    def start_batch(self) -> None:
        self._start = time.perf_counter()

    def end_batch(self, batch_size: Optional[int] = None) -> None:
        if self._start is None:
            return
        n = batch_size or self.batch_size
        self.batch_times.append((time.perf_counter() - self._start, n))
        self.total_samples += n
        self._start = None

    def get_metrics(self) -> Dict[str, float]:
        if not self.batch_times:
            return {}
        total_t = float(sum(t for t, _ in self.batch_times))
        total_n = sum(n for _, n in self.batch_times)
        mean_t = total_t / len(self.batch_times)
        return {
            "throughput/samples_per_sec": total_n / total_t,
            "throughput/batch_time_ms": mean_t * 1000.0,
            "throughput/steps_per_sec": 1.0 / mean_t,
        }

    def __getstate__(self):
        state = self.__dict__.copy()
        state["batch_times"] = list(self.batch_times)
        return state

    def __setstate__(self, state):
        state["batch_times"] = deque(state["batch_times"],
                                     maxlen=state["window_size"])
        self.__dict__.update(state)


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM stats in GB (TPU analogue of the reference's
    ``torch.cuda.memory_allocated`` polling, ``logging/core.py:294-300``)."""
    out: Dict[str, float] = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if not stats:
            continue
        gb = 1024 ** 3
        if "bytes_in_use" in stats:
            out[f"memory/device{i}_in_use_gb"] = stats["bytes_in_use"] / gb
        if "peak_bytes_in_use" in stats:
            out[f"memory/device{i}_peak_gb"] = stats["peak_bytes_in_use"] / gb
        if "bytes_limit" in stats:
            out[f"memory/device{i}_limit_gb"] = stats["bytes_limit"] / gb
    return out


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace capture around a block; no-op when dir unset."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
