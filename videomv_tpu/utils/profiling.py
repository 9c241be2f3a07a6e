"""Profiling & timing harness.

The reference has no tracing story (SURVEY.md §5: ad-hoc pynvml memory
polls only).  Here: a ``jax.profiler`` trace context that writes
TensorBoard-viewable traces, plus a ``block_until_ready`` timing helper
used by bench.py and the perf tests.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["trace", "time_fn", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str = "workspace/traces"):
    """Capture a device trace: ``with trace(): run_step()`` → view in
    TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 1,
    iters: int = 5,
    **kwargs,
) -> Dict[str, float]:
    """Wall-time a jitted function with block_until_ready fencing."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "p50_s": statistics.median(times),
        "mean_s": statistics.mean(times),
        "min_s": min(times),
        "max_s": max(times),
        "iters": iters,
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """HBM usage in GB (replacement for the reference's pynvml polling,
    inference_text2video_entrance.py:244-247)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    gb = 1024 ** 3
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
    }
