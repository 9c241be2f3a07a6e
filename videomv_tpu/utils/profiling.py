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
    """Wall-time a jitted function with block_until_ready fencing.

    CAUTION: on the tunneled axon TPU backend, ``block_until_ready`` can
    return before device execution completes, making single-dispatch timings
    meaningless (measured: 1.3ms for a true 78ms forward). For per-op
    numbers there, use ``time_chained`` below.
    """
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


def time_chained(step_fn: Callable, x0, n: int = 20, repeats: int = 3) -> float:
    """Robust per-step seconds via a jitted data-dependent chain.

    ``step_fn(x) -> y`` of x's shape; the chain ``x += 0.01*step_fn(x)``
    forces true sequential execution even on backends whose
    block_until_ready is unreliable (the axon tunnel)."""
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(x, _):
            return x + 0.01 * step_fn(x), None
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    s = chain(x0)
    s.block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        chain(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    return best
