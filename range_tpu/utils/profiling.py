"""Profiling/tracing hooks.

The reference's only instrumentation is a time.time() pair
(`visualize_embeddings.py:101-116`).  Here: a context manager around
jax.profiler traces (open the dump in XProf/TensorBoard), device memory
stats, and a fenced timer (see utils/metrics.StepTimer for the meter
variant)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    """Per-device memory stats when the backend exposes them."""
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


@contextlib.contextmanager
def fenced_timer(name: str = "block", out: Optional[list] = None):
    """Wall-clock a block; caller is responsible for device fencing (fetch a
    scalar from the result — tunneled-TPU block_until_ready is unreliable)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out.append((name, dt))
