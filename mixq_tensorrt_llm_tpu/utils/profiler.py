"""Profiling utilities: host-side phase timers + device trace capture.

Replaces the reference's profiler stack (tensorrt_llm/profiler.py host/
device timers + nvtx ranges; TRT layer profiler generation.py:168-177):
host timers are plain perf_counter spans, device visibility comes from
jax.profiler traces viewable in xprof/tensorboard, and memory stats come
from live-array accounting (the reference's mem monitor).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Profiler:
    """Named cumulative host timers (reference profiler.start/stop API)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._open: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._open.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    @contextlib.contextmanager
    def range(self, name: str):
        # also emits a named region into any active jax.profiler trace
        with jax.profiler.TraceAnnotation(name):
            self.start(name)
            try:
                yield
            finally:
                self.stop(name)

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n, t = self.counts[name], self.totals[name]
            lines.append(f"{name}: total {t*1e3:.1f} ms over {n} calls "
                         f"({t/n*1e3:.2f} ms avg)")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self._open.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an xprof trace of everything inside the context
    (reference --run_profiling / engine inspector analogue)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Live-buffer memory statistics (reference profiler mem monitor)."""
    device = device or jax.devices()[0]
    stats = {}
    try:
        raw = device.memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in raw:
                stats[k] = int(raw[k])
    except (AttributeError, NotImplementedError, jax.errors.JaxRuntimeError):
        pass
    if not stats:   # fallback: sum live arrays on this device
        total = 0
        for arr in jax.live_arrays():
            if device in arr.devices():
                total += arr.nbytes
        stats["bytes_in_use"] = total
    return stats


profiler = Profiler()
