"""Streaming (real-time) Savitzky-Golay filtering.

Functional port of the reference streaming module
(/root/reference/src/savgol_stream.c): a circular buffer of size 2n+1 is an
explicit, immutable pytree (``StreamState``), every push returns a new state,
and the whole-sequence online path is a single ``lax.scan``. Because the
carry is a plain pytree, streaming state is serializable / checkpointable for
free (orbax, pickle, ...) — the TPU-native equivalent of the reference's
trivially-copyable state struct (savgol_stream.h:29-37).

Exact semantic parity:

  * fixed latency of ``half_window`` samples (src/savgol_stream.c:289-295);
  * ``push`` emits nothing until the buffer holds 2n+1 samples, then one
    centered output per sample (src/savgol_stream.c:152-178);
  * ``push_full`` additionally emits the n leading-edge outputs (reversed
    ring traversal) + the first center output on the push that fills the
    buffer (src/savgol_stream.c:180-227);
  * ``flush`` emits up to n trailing-edge outputs with descending edge index
    n-1-i (src/savgol_stream.c:229-252); ``flush_leading`` re-emits the
    leading edge (src/savgol_stream.c:254-275);
  * conservation: with push_full + flush, total outputs == total inputs.

Since output buffers must be shape-static under jit, functions that can emit
a variable number of samples return a fixed-size array plus a ``count``; only
the first ``count`` entries are meaningful (the reference's
``(output, max_outputs) -> int`` contract, expressed functionally).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "StreamState",
    "stream_init",
    "stream_reset",
    "stream_push",
    "stream_push_full",
    "stream_flush",
    "stream_flush_leading",
    "stream_ready",
    "stream_buffered",
    "stream_apply",
    "ChunkState",
    "chunk_init",
    "stream_process_chunk",
    "stream_flush_chunked",
]


class StreamState(NamedTuple):
    """Streaming carry: ring buffer + counters (savgol_stream.h:29-37)."""

    buffer: jax.Array            # (2n+1,) ring buffer
    write_pos: jax.Array         # i32 — next write slot == oldest sample
    samples_received: jax.Array  # i32 — total pushed
    samples_output: jax.Array    # i32 — total emitted


def stream_init(half_window: int, dtype=jnp.float32) -> StreamState:
    """Fresh stream state (zeroed ring; savgol_stream_reset,
    src/savgol_stream.c:135-146)."""
    ws = 2 * half_window + 1
    return StreamState(
        buffer=jnp.zeros((ws,), dtype=dtype),
        write_pos=jnp.zeros((), dtype=jnp.int32),
        samples_received=jnp.zeros((), dtype=jnp.int32),
        samples_output=jnp.zeros((), dtype=jnp.int32),
    )


def stream_reset(state: StreamState) -> StreamState:
    return StreamState(
        buffer=jnp.zeros_like(state.buffer),
        write_pos=jnp.zeros_like(state.write_pos),
        samples_received=jnp.zeros_like(state.samples_received),
        samples_output=jnp.zeros_like(state.samples_output),
    )


def _write(state: StreamState, sample) -> StreamState:
    ws = state.buffer.shape[0]
    buf = state.buffer.at[state.write_pos].set(
        jnp.asarray(sample, dtype=state.buffer.dtype))
    return state._replace(
        buffer=buf,
        write_pos=(state.write_pos + 1) % ws,
        samples_received=state.samples_received + 1,
    )


def _aligned(state: StreamState) -> jax.Array:
    """Ring contents ordered oldest -> newest.

    After a write, ``write_pos`` points at the oldest sample, so
    ``aligned[i] = buffer[(write_pos + i) % ws]`` — the traversal of
    convolve_center_circular (src/savgol_stream.c:25-38)."""
    return jnp.roll(state.buffer, -state.write_pos)


def stream_ready(state: StreamState) -> jax.Array:
    ws = state.buffer.shape[0]
    return state.samples_received >= ws


def stream_buffered(state: StreamState) -> jax.Array:
    ws = state.buffer.shape[0]
    return jnp.minimum(state.samples_received, ws)


def stream_push(
    state: StreamState,
    sample,
    center_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
) -> Tuple[StreamState, jax.Array, jax.Array]:
    """Push one sample; returns (state, value, valid).

    ``value`` is meaningful only where ``valid`` is True — the filling
    phase emits nothing (src/savgol_stream.c:152-178).
    """
    state = _write(state, sample)
    valid = stream_ready(state)
    aligned = _aligned(state)
    value = jnp.where(
        valid,
        jnp.dot(center_w.astype(aligned.dtype), aligned,
                precision=jax.lax.Precision.HIGHEST)
        * jnp.asarray(dt_inv, dtype=aligned.dtype),
        jnp.zeros((), dtype=aligned.dtype),
    )
    state = state._replace(
        samples_output=state.samples_output + valid.astype(jnp.int32))
    return state, value, valid


def _leading_outputs(aligned, edge_w, dt_inv, lead_sign=1.0):
    """All n leading-edge values: edge row e against the REVERSED window
    (convolve_edge_leading, src/savgol_stream.c:61-74).

    ``lead_sign`` corrects the reference's odd-derivative sign flip at the
    leading edge (see savgol_tpu.ops.apply module docstring): pass
    ``(-1)**derivative`` for mathematically correct output, 1.0 for
    reference parity."""
    rev = aligned[::-1]
    out = jnp.einsum("ek,k->e", edge_w.astype(aligned.dtype), rev,
                     precision=jax.lax.Precision.HIGHEST)
    return out * (dt_inv * jnp.asarray(lead_sign, dtype=aligned.dtype))


def _trailing_outputs(aligned, edge_w, dt_inv):
    """Trailing-edge values in flush order: output i uses edge row n-1-i,
    forward traversal (src/savgol_stream.c:243-248)."""
    fwd = jnp.einsum("ek,k->e", edge_w.astype(aligned.dtype), aligned,
                     precision=jax.lax.Precision.HIGHEST) * dt_inv
    return fwd[::-1]


def stream_push_full(
    state: StreamState,
    sample,
    center_w: jax.Array,
    edge_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
    lead_sign: float = 1.0,
    max_outputs: Optional[int] = None,
) -> Tuple[StreamState, jax.Array, jax.Array]:
    """Push with full edge handling; returns (state, outputs, count).

    ``outputs`` has fixed shape (n+1,). count == 0 while filling; == n+1 on
    the fill-completing push (n leading-edge values + first center); == 1
    afterwards (src/savgol_stream.c:180-227).

    ``max_outputs`` (static) reproduces the C API's buffer-capacity clamp
    (src/savgol_stream.c:208-218): on the fill-completing push only the
    first ``max_outputs`` values are emitted, the rest are DROPPED (never
    re-emitted later), and ``samples_output`` counts only delivered
    samples — the reference increments it per written output.
    """
    n = (state.buffer.shape[0] - 1) // 2
    ws = state.buffer.shape[0]
    was_filling = state.samples_received < ws
    state = _write(state, sample)
    ready = stream_ready(state)
    aligned = _aligned(state)
    dt = jnp.asarray(dt_inv, dtype=aligned.dtype)

    center = jnp.dot(center_w.astype(aligned.dtype), aligned,
                     precision=jax.lax.Precision.HIGHEST) * dt
    lead = _leading_outputs(aligned, edge_w, dt, lead_sign)

    just_filled = jnp.logical_and(was_filling, ready)
    # outputs layout: filled-push -> [lead_0..lead_{n-1}, center]
    #                 steady      -> [center, 0, ..., 0]
    filled_vec = jnp.concatenate([lead, center[None]])
    steady_vec = jnp.zeros((n + 1,), dtype=aligned.dtype).at[0].set(center)
    outputs = jnp.where(just_filled, filled_vec, steady_vec)
    outputs = jnp.where(ready, outputs, jnp.zeros_like(outputs))
    count = jnp.where(ready, jnp.where(just_filled, n + 1, 1), 0)
    if max_outputs is not None:
        # clamp to [0, .]: the C returns 0 outputs for max_outputs <= 0
        # (src/savgol_stream.c:183) — a negative bound must not drive
        # counts (and samples_output) negative
        count = jnp.minimum(count, max(0, int(max_outputs)))
        outputs = jnp.where(jnp.arange(n + 1) < count, outputs, 0.0)
    state = state._replace(
        samples_output=state.samples_output + count.astype(jnp.int32))
    return state, outputs, count


def stream_flush(
    state: StreamState,
    center_w: jax.Array,
    edge_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
    max_count: Optional[int] = None,
) -> Tuple[StreamState, jax.Array, jax.Array]:
    """Trailing-edge flush at end of stream; returns (state, outputs, count).

    ``outputs`` has fixed shape (min(max_count, n),); count is 0 if the
    buffer never filled (src/savgol_stream.c:229-252).
    """
    del center_w  # kept for API symmetry
    n = (state.buffer.shape[0] - 1) // 2
    k = n if max_count is None else min(max(0, int(max_count)), n)
    ready = stream_ready(state)
    aligned = _aligned(state)
    dt = jnp.asarray(dt_inv, dtype=aligned.dtype)
    trail = _trailing_outputs(aligned, edge_w, dt)[:k]
    outputs = jnp.where(ready, trail, jnp.zeros_like(trail))
    count = jnp.where(ready, k, 0)
    state = state._replace(
        samples_output=state.samples_output + count.astype(jnp.int32))
    return state, outputs, count


def stream_flush_leading(
    state: StreamState,
    edge_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
    max_count: Optional[int] = None,
    lead_sign: float = 1.0,
) -> Tuple[StreamState, jax.Array, jax.Array]:
    """Leading-edge flush (src/savgol_stream.c:254-275)."""
    n = (state.buffer.shape[0] - 1) // 2
    k = n if max_count is None else min(max(0, int(max_count)), n)
    ready = stream_ready(state)
    aligned = _aligned(state)
    dt = jnp.asarray(dt_inv, dtype=aligned.dtype)
    lead = _leading_outputs(aligned, edge_w, dt, lead_sign)[:k]
    outputs = jnp.where(ready, lead, jnp.zeros_like(lead))
    count = jnp.where(ready, k, 0)
    state = state._replace(
        samples_output=state.samples_output + count.astype(jnp.int32))
    return state, outputs, count


def stream_apply(
    x: jax.Array,
    center_w: jax.Array,
    edge_w: jax.Array,
    *,
    half_window: int,
    dt_inv: float | jax.Array = 1.0,
    derivative: int = 0,
    reference_edge_sign: bool = False,
) -> jax.Array:
    """Whole-sequence online processing as one ``lax.scan``.

    Runs the push_full + flush protocol over a length-T sequence (T >= 2n+1)
    and stitches the emissions back into a length-T output — output count
    equals input count by construction (the conservation invariant of
    test_savgol_stream.c:277-304). The emission schedule is deterministic:
    push #(2n+1) emits n+1 values, every later push emits 1, flush emits n —
    so reassembly is static slicing, no dynamic scatter.
    """
    if x.ndim != 1:
        raise ValueError(
            f"stream_apply processes ONE sequence (got shape {x.shape}); "
            "vmap it for batches, or use the batch apply / chunked stream")
    n = int(half_window)
    ws = 2 * n + 1
    T = x.shape[-1]
    if T < ws:
        raise ValueError(f"stream_apply needs at least {ws} samples, got {T}")
    cw = center_w
    ew = edge_w
    dt = dt_inv
    lead_sign = 1.0
    if not reference_edge_sign and (int(derivative) % 2 == 1):
        lead_sign = -1.0

    def step(state, sample):
        # scalar-center push: stacking push_full's (n+1,) emission per
        # step would materialize a (T, n+1) buffer of which only one row
        # and one column are consumed — (n+1)x the useful output memory
        state, value, _ = stream_push(state, sample, cw, dt)
        return state, value

    state0 = stream_init(n, dtype=x.dtype)
    state, centers = jax.lax.scan(step, state0, x)   # (T,) center values
    _, tail, _ = stream_flush(state, cw, ew, dt)     # (n,)

    # the n leading-edge values are a pure function of the first window —
    # identical to the fill-completing push_full emission, whose ring is
    # aligned to x[:ws] at that step
    dtv = jnp.asarray(dt, dtype=x.dtype)
    lead = _leading_outputs(x[:ws], ew, dtv, lead_sign=lead_sign)
    return jnp.concatenate([lead, centers[ws - 1:], tail], axis=-1)


class ChunkState(NamedTuple):
    """Carry for chunked streaming: the last 2n+1 samples + counters."""

    tail: jax.Array              # (2n+1,) most recent samples, oldest first
    samples_received: jax.Array  # i32
    samples_output: jax.Array    # i32


def chunk_init(half_window: int, dtype=jnp.float32) -> ChunkState:
    """Fresh chunked-streaming state."""
    return ChunkState(
        tail=jnp.zeros((2 * half_window + 1,), dtype=dtype),
        samples_received=jnp.zeros((), dtype=jnp.int32),
        samples_output=jnp.zeros((), dtype=jnp.int32),
    )


def stream_process_chunk(
    state: ChunkState,
    chunk: jax.Array,
    center_w: jax.Array,
    edge_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
    lead_sign: float = 1.0,
) -> Tuple[ChunkState, jax.Array, jax.Array]:
    """High-throughput streaming: process a whole chunk per call.

    Semantically equivalent to calling :func:`stream_push_full` for every
    sample of ``chunk`` (same emission schedule: nothing until 2n+1 samples
    arrive, then the n leading-edge values + first center, then one center
    per sample) but vectorized — per-chunk cost is one valid correlation
    instead of a sequential scan, so throughput matches the batch path
    while latency stays bounded by chunk size + half_window. This is the
    TPU-native answer to the survey's streaming-scan hard part: the
    per-sample lax.scan path is exact but latency-bound; this path trades
    sample-level for chunk-level latency at full VPU throughput.

    Returns ``(state, outputs, count)``; ``outputs`` has fixed shape
    ``(len(chunk) + half_window + 1,)``, only ``outputs[:count]`` is
    meaningful. Finish the stream with :func:`stream_flush_chunked`.
    """
    from savgol_tpu.ops.apply import _pallas_corr_diff, correlate_valid

    ws = state.tail.shape[0]
    n = (ws - 1) // 2
    C = chunk.shape[0]
    chunk = chunk.astype(state.tail.dtype)
    dt = jnp.asarray(dt_inv, dtype=state.tail.dtype)
    t0 = state.samples_received
    t1 = t0 + C

    # ext[i] = stream sample t0 - ws + i (zeros where negative), len ws + C
    ext = jnp.concatenate([state.tail, chunk])
    # Window starting at ext index i is centered at p(i) = t0 - n - 1 + i;
    # centers[i] = filtered value at position p(i), i = 0..C.
    # The unbatched (1, C+ws) XLA conv is the pathological shape on TPU
    # (~0.05 Gs/s); the Pallas dispatcher folds big chunks into tile rows
    # and keeps the whole step at batch-path rates.
    if jax.default_backend() == "tpu":
        centers = _pallas_corr_diff()(ext[None, :], center_w)[0] * dt
    else:
        centers = correlate_valid(ext[None, :], center_w)[0] * dt  # (C + 1,)

    # Emission schedule: center p is emitted once p + n + 1 samples exist,
    # i.e. this chunk emits p in [max(n, t0 - n), t1 - 1 - n].
    first_center = jnp.maximum(t0 - n, n)
    n_centers = jnp.clip(t1 - n - first_center, 0, C)
    crossed = jnp.logical_and(t0 < ws, t1 >= ws)
    n_lead = jnp.where(crossed, n, 0)
    count = n_lead + n_centers

    # Leading-edge values (only meaningful when crossing the fill point):
    # need the first ws stream samples, at ext positions [ws - t0, ...).
    start = jnp.clip(ws - t0, 0, ws)
    first_win = lax.dynamic_slice(ext, (start,), (ws,))
    lead = jnp.einsum("ek,k->e", edge_w.astype(ext.dtype), first_win[::-1],
                      precision=jax.lax.Precision.HIGHEST)
    lead = lead * dt * jnp.asarray(lead_sign, dtype=ext.dtype)

    # Assemble: out[j] = lead[j] for j < n_lead, else
    # centers[coff + j - n_lead] where coff maps first_center into centers.
    # The center block is an affine re-index — ONE dynamic_slice of a
    # zero-guarded buffer instead of a full-length gather (the start can
    # be as low as coff - n, hence the n-zero left guard); the lead values
    # only ever touch the first n positions, a static window.
    coff = first_center - (t0 - n - 1)
    idx = jnp.arange(C + n + 1)
    # left guard n (start >= coff - n_lead + n >= 1 - n + n); right guard
    # 3n+2 (start can reach 3n+1 when the fill point was just crossed)
    buf = jnp.concatenate([jnp.zeros((n,), dtype=ext.dtype), centers,
                           jnp.zeros((3 * n + 2,), dtype=ext.dtype)])
    out = lax.dynamic_slice(buf, (coff - n_lead + n,), (C + n + 1,))
    if n > 0:
        head = jnp.where(jnp.arange(n) < n_lead, lead, out[:n])
        out = lax.dynamic_update_slice(out, head, (0,))
    out = jnp.where(idx < count, out, 0.0)

    state = ChunkState(
        tail=ext[-ws:],
        samples_received=t1.astype(jnp.int32),
        samples_output=(state.samples_output + count).astype(jnp.int32),
    )
    return state, out, count


def stream_flush_chunked(
    state: ChunkState,
    edge_w: jax.Array,
    dt_inv: float | jax.Array = 1.0,
) -> Tuple[ChunkState, jax.Array, jax.Array]:
    """Trailing-edge flush for the chunked stream (mirrors
    :func:`stream_flush`): up to n outputs over the last full window."""
    ws = state.tail.shape[0]
    n = (ws - 1) // 2
    ready = state.samples_received >= ws
    dt = jnp.asarray(dt_inv, dtype=state.tail.dtype)
    trail = _trailing_outputs(state.tail, edge_w, dt)
    outputs = jnp.where(ready, trail, jnp.zeros_like(trail))
    count = jnp.where(ready, n, 0)
    state = state._replace(
        samples_output=(state.samples_output + count).astype(jnp.int32))
    return state, outputs, count
