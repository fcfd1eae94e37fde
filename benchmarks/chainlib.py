"""Canonical chained k-difference timing — the repo's ONE trusted
on-device measurement protocol (CLAUDE.md "Measurement pitfalls").

Every probe and bench.py delegate here so protocol fixes (the k=2
jitter lesson, the k-scaling check, .lower().compile() reuse) land in
one place instead of drifting across copies.

Protocol: jit a ``lax.scan`` chain of the body at lengths k and 2k and
return ``(t(2k) - t(k)) / k``.  Each step feeds the previous output
back in (scaled, optionally re-padded to the input geometry) so the
virtualized dev stack cannot dedup identical dispatches; the
k-difference cancels dispatch/tunnel overhead AND the chain's own glue.

Known traps this module encodes:
- CHEAP bodies (copies, elementwise) get collapsed somewhere in the
  virtualized stack and report impossible rates — only time verified
  real computations, and always check the returned ratio.
- Sub-millisecond steps at k=2 are jitter-swamped on the shared dev
  chip (a k=2 run once claimed a 37% tile win that k=16 refuted, and
  another produced NEGATIVE rates); prefer k >= 4, or k = 16 for
  sub-ms bodies.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

__all__ = ["bench_chain", "RATIO_BAND"]

# t(2k)/t(k) must sit near 2 for the difference to mean anything
RATIO_BAND = (1.6, 2.6)


def bench_chain(fn, x, *rest, iters=5, k=4, feedback=None,
                feedback_scale=1e-3, return_info=False):
    """Per-step on-device seconds of ``fn`` via the k-difference.

    fn(x, *rest) -> array. ``feedback(y, template)`` maps each step's
    output back to the next step's input; the default scales by
    ``feedback_scale`` and casts to the template dtype, which requires
    same-shaped outputs — bodies that change geometry (VALID modes)
    must pass an explicit re-padding feedback.

    Returns per-step seconds, or ``(per_step, ratio, compiled_k)`` when
    ``return_info`` (compiled_k is the jitted k-chain executable, for
    HLO marker asserts via ``.as_text()``). Callers decide what to do
    with an out-of-band ratio; a ``!!`` line is printed either way.
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
        # stderr: bench.py's stdout is a single-JSON-line contract
        print(f"  !! k-scaling suspect: t({2 * k})/t({k}) = {ratio:.2f}",
              file=sys.stderr)
    if return_info:
        return per_step, ratio, compiled[k]
    return per_step
