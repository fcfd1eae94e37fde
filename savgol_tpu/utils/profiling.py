"""Profiling and timing utilities.

The reference's only instrumentation is clock() wall-timing in its
benchmark (test_savgol_main.c:140-148). Here: a context manager around the
JAX profiler (TensorBoard-compatible traces) and a robust timing helper that
handles async dispatch correctly (block_until_ready, warmup for compile)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto::

        with profiling.trace("/tmp/sg_trace"):
            f.apply(x).block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 3):
    """Wall-time ``fn(*args)`` with compile warmup and async-safe timing.

    Returns (seconds_per_call, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
