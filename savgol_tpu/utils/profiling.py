"""Profiling and timing utilities.

The reference's only instrumentation is clock() wall-timing in its
benchmark (test_savgol_main.c:140-148). Here: a context manager around the
JAX profiler (TensorBoard-compatible traces) and a robust timing helper that
handles async dispatch correctly (block_until_ready, warmup for compile)."""

from __future__ import annotations

import contextlib
import functools
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "benchmark", "benchmark_chained", "RATIO_BAND"]


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


# t(2k)/t(k) must sit near 2 for the k-difference to mean anything.
# The band is the ONE acceptance range for the protocol (bench.py and the
# probes import it — do not hand-code a second band). Lower bound 1.4, not
# ~1.6: a genuine per-invocation fixed cost F lowers the ratio to
# (F + 2ks)/(F + ks) < 2 while the k-difference still cancels F exactly —
# at ratio 1.4 the difference amplifies timing noise ~5x (acceptable at
# iters>=5); ratios near 1.0 mean the virtualized stack collapsed the
# chain (dedup) and the difference is garbage.
RATIO_BAND = (1.4, 2.7)


def benchmark_chained(fn: Callable, x, *rest, iters: int = 5, k: int = 4,
                      feedback: Callable | None = None,
                      feedback_scale: float = 1e-3,
                      return_info: bool = False):
    """Per-step on-device seconds of ``fn`` via the chained k-difference.

    `benchmark` measures wall time, which on remote/virtualized devices
    includes per-dispatch RTT and can be DEDUPED for repeated identical
    inputs — both mislead for small per-call times. This protocol jits a
    ``lax.scan`` chain of ``fn`` at lengths k and 2k and returns
    ``(t(2k) - t(k)) / k``: each step feeds the previous output back in
    (scaled by ``feedback_scale``), so no two dispatches are identical,
    and the difference cancels dispatch overhead AND the chain's glue.

    ``fn(x, *rest)`` must map ``x`` to a same-shaped array under the
    default feedback; pass ``feedback(y, template) -> next_input`` for
    geometry-changing bodies (e.g. re-pad a VALID output).

    The k-scaling ratio is checked against ``RATIO_BAND`` (sub-ms steps
    at small k are jitter-swamped — raise k until the ratio sits near 2)
    and a warning line is printed to stderr when it fails.
    ``return_info=True`` returns ``(per_step, ratio, compiled_k_chain)``
    instead of just ``per_step``.
    """
    if feedback is None:
        def feedback(y, template):
            return (y * jnp.asarray(feedback_scale,
                                    dtype=y.dtype)).astype(template.dtype)

    def chained(v, kk):
        def body(carry, _):
            return feedback(fn(carry, *rest), v), None
        out, _ = jax.lax.scan(body, v, None, length=kk)
        return out

    times = {}
    compiled = {}
    for kk in (k, 2 * k):
        cf = jax.jit(functools.partial(chained, kk=kk)).lower(x).compile()
        compiled[kk] = cf
        out = cf(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = cf(out)
        jax.block_until_ready(out)
        times[kk] = (time.perf_counter() - t0) / iters

    per_step = (times[2 * k] - times[k]) / k
    ratio = times[2 * k] / max(times[k], 1e-12)
    if not RATIO_BAND[0] <= ratio <= RATIO_BAND[1]:
        print(f"  !! k-scaling suspect: t({2 * k})/t({k}) = {ratio:.2f}",
              file=sys.stderr)
    if return_info:
        return per_step, ratio, compiled[k]
    return per_step
