"""Stateful convenience wrapper around the functional streaming core.

The functional API in :mod:`savgol_tpu.stream` is the real implementation
(pure, scannable, checkpointable); this class offers the reference's
imperative surface (push / push_full / flush / reset / queries —
/root/reference/include/iterative/savgol_stream.h) for interactive use and
for 1:1 test portability. It simply threads a ``StreamState`` through the
functional ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from savgol_tpu import stream as fstream
from savgol_tpu.config import SavgolConfig
from savgol_tpu.models.filter1d import Savgol1D

__all__ = ["SavgolStream"]


class SavgolStream:
    """Real-time sample-by-sample filter with fixed latency half_window.

    Create from a config (owns a fresh :class:`Savgol1D`) or attach to an
    existing filter — mirroring ``savgol_stream_create`` /
    ``savgol_stream_init`` (src/savgol_stream.c:80-120).
    """

    def __init__(self, config_or_filter, dtype=jnp.float32):
        if isinstance(config_or_filter, SavgolConfig):
            self.filter = Savgol1D.create(config_or_filter, dtype=dtype)
        elif isinstance(config_or_filter, Savgol1D):
            self.filter = config_or_filter
        else:
            raise TypeError(
                "expected SavgolConfig or Savgol1D, got "
                f"{type(config_or_filter)!r}")
        self._dtype = dtype
        d = self.filter.config.derivative
        # Correct the reference's leading-edge sign flip for odd derivatives
        # (see savgol_tpu.ops.apply module docstring).
        self._lead_sign = -1.0 if (d % 2 == 1) else 1.0
        self.state = fstream.stream_init(self.filter.half_window, dtype=dtype)

    # -- queries (src/savgol_stream.c:281-315) -------------------------------

    @property
    def ready(self) -> bool:
        return bool(fstream.stream_ready(self.state))

    @property
    def latency(self) -> int:
        return self.filter.half_window

    @property
    def buffered(self) -> int:
        return int(fstream.stream_buffered(self.state))

    @property
    def samples_received(self) -> int:
        return int(self.state.samples_received)

    @property
    def samples_output(self) -> int:
        return int(self.state.samples_output)

    # -- operation ------------------------------------------------------------

    def reset(self) -> None:
        self.state = fstream.stream_reset(self.state)

    def push(self, sample) -> Tuple[float, bool]:
        """Push one sample; returns (value, valid)."""
        self.state, value, valid = fstream.stream_push(
            self.state, sample, self.filter.center_weights,
            self.filter.dt_inv)
        return float(value), bool(valid)

    def push_full(self, sample, max_outputs: Optional[int] = None) -> np.ndarray:
        """Push with edge handling; returns the emitted samples (possibly
        empty). ``max_outputs`` clamps like the C API: clamped-off values on
        the fill-completing push are dropped (not buffered), and
        ``samples_output`` counts only delivered samples
        (src/savgol_stream.c:208-227)."""
        self.state, outs, count = fstream.stream_push_full(
            self.state, sample, self.filter.center_weights,
            self.filter.edge_weights, self.filter.dt_inv,
            lead_sign=self._lead_sign, max_outputs=max_outputs)
        return np.asarray(outs)[:int(count)]

    def flush(self, max_count: Optional[int] = None) -> np.ndarray:
        """Trailing-edge flush; returns emitted samples."""
        self.state, outs, count = fstream.stream_flush(
            self.state, self.filter.center_weights,
            self.filter.edge_weights, self.filter.dt_inv,
            max_count=max_count)
        return np.asarray(outs)[:int(count)]

    def flush_leading(self, max_count: Optional[int] = None) -> np.ndarray:
        self.state, outs, count = fstream.stream_flush_leading(
            self.state, self.filter.edge_weights, self.filter.dt_inv,
            max_count=max_count, lead_sign=self._lead_sign)
        return np.asarray(outs)[:int(count)]

    def process_chunked(self, chunks):
        """Generator-style chunked processing: yields output arrays per
        chunk at batch-path throughput (see stream_process_chunk); call
        with an iterable of 1D arrays, then consume the final flush."""
        st = fstream.chunk_init(self.filter.half_window, dtype=self._dtype)
        cw, ew = self.filter.center_weights, self.filter.edge_weights
        for ch in chunks:
            st, o, c = fstream.stream_process_chunk(
                st, jnp.asarray(ch, dtype=self._dtype), cw, ew,
                self.filter.dt_inv, lead_sign=self._lead_sign)
            yield np.asarray(o)[:int(c)]
        st, o, c = fstream.stream_flush_chunked(st, ew, self.filter.dt_inv)
        yield np.asarray(o)[:int(c)]

    def process(self, x) -> jax.Array:
        """Whole-sequence online processing via ``lax.scan``; returns a
        same-length filtered array (does not mutate this object's state)."""
        return fstream.stream_apply(
            jnp.asarray(x, dtype=self._dtype),
            self.filter.center_weights, self.filter.edge_weights,
            half_window=self.filter.half_window, dt_inv=self.filter.dt_inv,
            derivative=self.filter.config.derivative)
