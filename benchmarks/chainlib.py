"""Chained k-difference timing for the probe scripts.

The protocol implementation lives in the package —
``savgol_tpu.utils.profiling.benchmark_chained`` (with the full rationale
and the jitter/dedup traps it encodes; see also CLAUDE.md "Measurement
pitfalls"). This module only re-exports it under the probes' historical
name so every probe and bench.py share ONE implementation.
"""
from savgol_tpu.utils.profiling import (RATIO_BAND,  # noqa: F401
                                        benchmark_chained as bench_chain)

__all__ = ["bench_chain", "RATIO_BAND"]
