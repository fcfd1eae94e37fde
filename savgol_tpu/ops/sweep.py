"""Fused on-device weight generation + apply for (n, m) parameter sweeps.

The host generator (savgol_tpu.ops.weights) needs static half_window /
poly_order because shapes depend on them. This module provides a MASKED
formulation where ``half_window`` and ``poly_order`` are *traced* values:
everything is padded to the compile-time limits (window 65, order 10 —
savgolFilter.h:38-48), invalid lanes are zeroed, and the whole
weights+filter pipeline becomes one jittable, vmappable function of
(n, m, x). One compiled executable then sweeps arbitrary (n, m) grids —
the TPU-native answer to "create a filter per config in a loop"
(BASELINE.json config 5).

Masking invariants (why no NaNs escape):

  * the Gram recurrence divides by k(2n-k+1), which is positive for every
    k <= m < 2n+1 (valid configs); rows k > m are force-zeroed each
    iteration so NaN/Inf from invalid denominators never propagates;
  * weights outside the true window |i| > n are zeroed, so the fixed
    65-tap correlation over a max_n-padded input computes exactly the
    2n+1-tap result;
  * boundary pad values for symmetric/edge/wrap do not depend on the pad
    width, so padding by max_n instead of n is semantics-preserving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from savgol_tpu.config import (MAX_HALF_WINDOW, MAX_POLY_ORDER,
                               PAD_MODE, BoundaryMode)

__all__ = ["savgol_weights_masked", "savgol_apply_sweep"]

_M = MAX_HALF_WINDOW           # 32
_K = MAX_POLY_ORDER            # 10
_W = 2 * _M + 1                # 65


def _genfact_ratio(two_n, k: int, dtype):
    """(2k+1) * GenFact(2n, k) / GenFact(2n+k+1, k+1) with traced n,
    static k — the normalization of src/savgolFilter.c:343-346, computed
    as a static-length product of traced factors."""
    num = jnp.ones((), dtype=dtype)
    for j in range(k):                      # GenFact(2n, k)
        num = num * (two_n - j)
    den = jnp.ones((), dtype=dtype)
    for j in range(k + 1):                  # GenFact(2n+k+1, k+1)
        den = den * (two_n + k + 1 - j)
    return (2 * k + 1) * num / den


def _gram_masked(points, n, m, dmax: int, dtype):
    """Gram table F_k^{(d)}(points) with traced n, m; rows k > m zeroed.

    ``points`` may itself be traced. Returns (K+1, dmax+1, P).

    The recurrence is vectorized over the DERIVATIVE dimension (each k
    step is ~5 ops on a (dmax+1, P) block instead of ~3*(dmax+1) scalar-
    vector ops): the d*F^{(d-1)} term becomes a d-index row shift times
    the d vector — measured on v5e, the sweep's per-call fixed cost is
    dominated by tiny-op launch overhead, so op count IS the cost."""
    i = points.astype(dtype)[None, :]                # (1, P)
    nf = n.astype(dtype)
    P = points.shape[0]
    D = dmax + 1
    dvec = jnp.arange(D, dtype=dtype)[:, None]       # (D, 1)

    def dshift(r):
        # rows shifted down one derivative order: [0; r[0]; ...; r[D-2]]
        return jnp.concatenate(
            [jnp.zeros((1, P), dtype=dtype), r[:-1]], axis=0)

    row0 = jnp.zeros((D, P), dtype=dtype).at[0].set(1.0)
    rows = [row0]
    if _K >= 1:
        inv_n = 1.0 / nf
        r1 = inv_n * (i * row0 + dvec * dshift(row0))
        rows.append(jnp.where(1 <= m, r1, 0.0))
    for k in range(2, _K + 1):
        denom = k * (2.0 * nf - k + 1.0)
        denom = jnp.where(denom != 0, denom, 1.0)   # guard invalid k > m
        alpha = (4.0 * k - 2.0) / denom
        gamma = ((k - 1.0) * (2.0 * nf + k)) / denom
        prev1, prev2 = rows[k - 1], rows[k - 2]
        curr = alpha * (i * prev1 + dvec * dshift(prev1)) - gamma * prev2
        rows.append(jnp.where(k <= m, curr, 0.0))
    return jnp.stack(rows)                           # (K+1, dmax+1, P)


def savgol_weights_masked(n, m, derivative: int = 0, dtype=jnp.float32):
    """Weights for traced (n, m): center (65,), lead (32, 65),
    trail (32, 65), all padded/masked.

    * ``center[_M + i]`` weights x[j+i] for |i| <= n, zero outside.
    * ``trail[e]`` is the reference edge row (target t = n - e,
      src/savgolFilter.c:401) over window coords [_M + i]; rows e >= n
      are zero.
    * ``lead[e]`` evaluates at target t = e - n (the *correct-sign*
      leading edge; see savgol_tpu.ops.apply on the reference's odd-
      derivative sign flip).
    """
    n = jnp.asarray(n)
    m = jnp.asarray(m)
    d = int(derivative)
    pts = jnp.arange(-_M, _M + 1, dtype=dtype)
    G = _gram_masked(pts, n, m, d, dtype)            # (K+1, d+1, 65)

    two_n = (2 * n).astype(dtype)
    factors = jnp.stack(
        [jnp.where(k <= m, _genfact_ratio(two_n, k, dtype), 0.0)
         for k in range(_K + 1)])                     # (K+1,)

    basis = G[:, 0, :]                               # F_k^{(0)}(i), (K+1, 65)
    win_mask = (jnp.abs(jnp.arange(-_M, _M + 1)) <= n).astype(dtype)

    hp = jax.lax.Precision.HIGHEST
    # -- center: target t = 0 (table column _M) -----------------------------
    center = jnp.einsum("k,ki->i", factors * G[:, d, _M], basis,
                        precision=hp) * win_mask

    # -- edge rows: evaluate G at traced targets via gather ------------------
    e = jnp.arange(_M)
    trail_cols = jnp.clip(_M + n - e, 0, _W - 1)     # t = n - e
    lead_cols = jnp.clip(_M + e - n, 0, _W - 1)      # t = e - n
    Gd = G[:, d, :]                                  # (K+1, 65)
    g_trail = jnp.take(Gd, trail_cols, axis=1)       # (K+1, 32)
    g_lead = jnp.take(Gd, lead_cols, axis=1)
    row_mask = (e < n).astype(dtype)[:, None]
    trail = jnp.einsum("ke,ki->ei", factors[:, None] * g_trail,
                       basis, precision=hp) * win_mask * row_mask
    lead = jnp.einsum("ke,ki->ei", factors[:, None] * g_lead,
                      basis, precision=hp) * win_mask * row_mask
    return center, lead, trail


_PAD_MODE = PAD_MODE   # canonical mapping lives next to BoundaryMode


def _bank_conv_xla(x, w_stack, precision=jax.lax.Precision.HIGHEST):
    """Valid correlation of x (..., Np) with a (C, ws) stencil stack as ONE
    conv with C output channels; returns (C, ..., Np - ws + 1)."""
    C, ws = w_stack.shape
    batch_shape = x.shape[:-1]
    Np = x.shape[-1]
    xb = x.reshape((-1, 1, Np))
    out = lax.conv_general_dilated(
        xb, w_stack.reshape((C, 1, ws)).astype(x.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision)
    out = jnp.moveaxis(out, 1, 0)             # (C, B, n_out)
    return out.reshape((C,) + batch_shape + (Np - ws + 1,))


@functools.lru_cache(maxsize=None)
def _sweep_weights_cached(hw_key: tuple, po_key: tuple, derivative: int,
                          dtype):
    """Device weight stacks for CONCRETE configs, computed once.

    The vmapped on-device generator is a sizeable op soup (~0.7 ms per
    launch on v5e); regenerating it per apply capped the benched sweep
    at ~1.05 Gs/s/config while the conv's marginal rate is 1.65
    (probe_sweep_bank.py). Same generator, same dtype — bit-identical
    weights to the fused in-graph form, just cached across calls (and a
    CONSTANT inside callers' jits, so chained pipelines hoist it)."""
    # escape any OUTER trace: without this, a first call from inside a
    # user jit would populate the cache with that trace's TRACERS
    # (observed UnexpectedTracerError on the second call)
    with jax.ensure_compile_time_eval():
        hw = jnp.asarray(hw_key)
        po = jnp.asarray(po_key)
        gen = jax.jit(jax.vmap(
            lambda n, m: savgol_weights_masked(n, m, derivative, dtype)))
        center, lead, trail = gen(hw, po)
    return (jax.block_until_ready(center), jax.block_until_ready(lead),
            jax.block_until_ready(trail))


def _apply_sweep_jit(x, hw, po, derivative, boundary, dt_inv, dtype,
                     method, reference_edge_sign):
    """Dispatch: concrete configs get a per-config SPECIALIZED jit over
    host-numpy weight constants (bands fold at trace time — weights
    passed as runtime device arrays kept the one-hot on-device band
    build in the hot path); traced configs generate everything in-graph
    (fully fused)."""
    d = int(derivative)
    # Specialization compiles once PER CONFIG TUPLE (vs once per shape
    # for the traced path) — worth it only where the per-dispatch fixed
    # cost it removes matters. Small inputs (tests, fuzz campaigns with
    # random configs) keep the shared traced compile.
    if (x.shape[-1] >= _SPECIALIZE_MIN_N
            and not (isinstance(hw, jax.core.Tracer)
                     or isinstance(po, jax.core.Tracer))):
        hw_key = tuple(int(v) for v in np.asarray(hw))
        po_key = tuple(int(v) for v in np.asarray(po))
        run = _sweep_apply_specialized(hw_key, po_key, d, boundary,
                                       dtype, method,
                                       reference_edge_sign)
        return run(x, dt_inv)
    return _apply_sweep_traced(x, hw, po, d, boundary, dt_inv, dtype,
                               method, reference_edge_sign)


_SPECIALIZE_MIN_N = 16384


@functools.lru_cache(maxsize=None)
def _sweep_apply_specialized(hw_key, po_key, derivative, boundary, dtype,
                             method, reference_edge_sign):
    """Jitted apply specialized to one CONCRETE config tuple: the weight
    stacks become host-numpy constants inside the trace, so the band
    matrices constant-fold instead of running a per-call on-device
    gather/one-hot build."""
    center, lead, trail = _sweep_weights_cached(hw_key, po_key,
                                                derivative, dtype)
    c_np = np.asarray(center)
    l_np = np.asarray(lead)
    t_np = np.asarray(trail)
    hw_np = np.asarray(hw_key)

    @jax.jit
    def run(x, dt_inv):
        return _sweep_core_body(x, hw_np, c_np, l_np, t_np, derivative,
                                boundary, dt_inv, method,
                                reference_edge_sign)

    return run


@functools.partial(jax.jit, static_argnames=("derivative", "boundary",
                                             "dtype", "method",
                                             "reference_edge_sign"))
def _apply_sweep_traced(x, hw, po, derivative, boundary, dt_inv, dtype,
                        method, reference_edge_sign):
    d = int(derivative)
    center, lead_w, trail_w = jax.vmap(
        lambda n, m: savgol_weights_masked(n, m, d, dtype))(hw, po)
    return _sweep_core_body(x, hw, center, lead_w, trail_w, d, boundary,
                            dt_inv, method, reference_edge_sign)


def _sweep_core_body(x, hw, center, lead_w, trail_w, derivative,
                     boundary, dt_inv, method, reference_edge_sign):
    """All C configs in one pass: the center correlation runs as a K-stencil
    BANK (one read of the data for every config — the Pallas bank kernel on
    TPU, a C-output-channel conv elsewhere) instead of per-config vmap
    lanes; only the tiny edge fixups are vmapped. Not jitted itself —
    the traced path and the per-config specialized closures wrap it."""
    d = int(derivative)
    hp = jax.lax.Precision.HIGHEST
    if reference_edge_sign and d % 2 == 1:
        # reproduce the C's reversed-data leading edge, which negates odd
        # derivatives (src/savgolFilter.c:773-777)
        lead_w = -lead_w
    N = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(_M, _M)]
    if boundary is BoundaryMode.POLYNOMIAL:
        xp = jnp.pad(x, pad)                        # zeros; edges fixed below
    else:
        xp = jnp.pad(x, pad, mode=_PAD_MODE[boundary])

    m = method
    if m == "auto":
        # measured on v5e (chained marginal rate, 6 cfg x 131k,
        # benchmarks/probe_sweep_bank.py): ONE K-stencil MXU bank kernel
        # 1.65 Gs/s/config vs 0.73 for per-config banded-MXU einsum
        # launches, 1.06 for the VPU bank, 0.09 for the XLA conv
        m = "mxu_bank" if jax.default_backend() == "tpu" else "xla"
    if m == "pallas":
        from savgol_tpu.ops.pallas_conv import correlate_valid_bank_pallas
        y = correlate_valid_bank_pallas(xp, center)      # (C, ..., N)
    elif m == "xla":
        y = _bank_conv_xla(xp, center)
    elif m == "mxu":
        from savgol_tpu.ops.apply import correlate_valid_mxu
        y = jax.vmap(lambda w: correlate_valid_mxu(xp, w))(center)
    elif m == "mxu_bank":
        # ONE kernel for all C configs: the K-stencil MXU bank shares a
        # single folded input pass across the per-config band pairs,
        # killing the C x 0.6-0.9 ms per-launch fixed cost of the
        # vmapped einsum form (benchmarks/probe_sweep.py)
        from savgol_tpu.ops.pallas_conv import \
            correlate_valid_bank_pallas_mxu
        y = correlate_valid_bank_pallas_mxu(xp, center)
    else:
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'mxu' or "
            f"'mxu_bank', got {m!r}")

    if (boundary is BoundaryMode.POLYNOMIAL
            and isinstance(center, np.ndarray) and N >= _M + 1):
        # CONCRETE configs (the specialized path): ONE batched edge fix.
        # The per-config vmap fix below is ~8 small ops PER CONFIG
        # (dynamic slices/updates + einsums), ~0.75 ms of fixed cost per
        # dispatch at 6 configs on v5e — most of the benched sweep gap
        # to the conv's 1.65 Gs/s/config marginal rate. With n_c known,
        # the per-config window shift folds into HOST-shifted weight
        # tensors over two STATIC 97-wide windows, and the scatter
        # becomes two pads + two selects.
        C = center.shape[0]
        hw_np = np.asarray(hw)
        w97 = _M + _W                                  # 97
        lw2 = np.zeros((C, _M, w97), center.dtype)
        tw2 = np.zeros((C, _M, w97), center.dtype)
        for ci, n_c in enumerate(hw_np):
            lw2[ci, :, n_c:n_c + _W] = lead_w[ci]
            tw2[ci, :, _M - n_c:_M - n_c + _W] = trail_w[ci]
        win0 = xp[..., :w97]
        winT = xp[..., N - _M - 1:N + _W - 1]          # xp width N + 2M
        lead = jnp.einsum("cek,...k->c...e", jnp.asarray(lw2), win0,
                          precision=hp)                # (C, ..., _M)
        trail = jnp.einsum("cek,...k->c...e", jnp.asarray(tw2), winT,
                           precision=hp)
        pos = jnp.arange(N)
        hwb = jnp.asarray(hw_np).reshape((C,) + (1,) * x.ndim)
        pad_tail = [(0, 0)] * (lead.ndim - 1) + [(0, N - _M)]
        lead_full = jnp.pad(lead, pad_tail)
        pad_head = [(0, 0)] * (lead.ndim - 1) + [(N - _M, 0)]
        trail_full = jnp.pad(trail[..., ::-1], pad_head)
        y = jnp.where(pos < hwb, lead_full, y)
        y = jnp.where(pos >= N - hwb, trail_full, y)
    elif boundary is BoundaryMode.POLYNOMIAL:
        win = min(_M, N)          # N >= 2*max_n+1 may still be < _M
        posw = jnp.arange(win)
        pos = jnp.arange(N)

        def fix(yc, n, lw, tw):
            # Edge outputs live in the first/last _M positions only, so the
            # fix touches two static windows (dynamic_update_slice)
            # instead of gathering over the whole length.
            start = (0,) * (x.ndim - 1) + (n,)
            win0 = lax.dynamic_slice(xp, start, x.shape[:-1] + (_W,))
            lead = jnp.einsum("ek,...k->...e", lw, win0, precision=hp)
            startt = (0,) * (x.ndim - 1) + (N - 1 - n,)
            winT = lax.dynamic_slice(xp, startt, x.shape[:-1] + (_W,))
            trail = jnp.einsum("ek,...k->...e", tw, winT, precision=hp)
            if win < _M:
                # short inputs: window updates could overlap; fall back to
                # whole-length masking (cheap at these sizes)
                lead_vals = jnp.take(lead, jnp.clip(pos, 0, _M - 1),
                                     axis=-1)
                trail_vals = jnp.take(trail,
                                      jnp.clip(N - 1 - pos, 0, _M - 1),
                                      axis=-1)
                yc = jnp.where(pos < n, lead_vals, yc)
                return jnp.where(pos >= N - n, trail_vals, yc)
            zeros = (0,) * (x.ndim - 1)
            head = lax.dynamic_slice(yc, zeros + (0,),
                                     x.shape[:-1] + (win,))
            head = jnp.where(posw < n, lead[..., :win], head)
            yc = lax.dynamic_update_slice(yc, head, zeros + (0,))
            tail = lax.dynamic_slice(yc, zeros + (N - win,),
                                     x.shape[:-1] + (win,))
            tail = jnp.where(win - 1 - posw < n,
                             trail[..., ::-1][..., _M - win:], tail)
            return lax.dynamic_update_slice(yc, tail, zeros + (N - win,))

        y = jax.vmap(fix)(y, hw, lead_w, trail_w)
    return y * jnp.asarray(dt_inv, dtype=x.dtype)


def savgol_apply_sweep(
    x: jax.Array,
    half_windows: jax.Array,
    poly_orders: jax.Array,
    *,
    derivative: int = 0,
    boundary: BoundaryMode = BoundaryMode.POLYNOMIAL,
    dt_inv=1.0,
    dtype=jnp.float32,
    method: str = "auto",
    reference_edge_sign: bool = False,
) -> jax.Array:
    """Filter ``x`` (..., N) under EVERY config (half_windows[c],
    poly_orders[c]) in one fused, vmapped computation.

    Returns (C, ..., N). Weight generation happens on device inside the
    same executable — nothing is retraced or transferred per config. The
    leading edge defaults to the correct-sign convention (negative
    targets); pass ``reference_edge_sign=True`` for the C's reversed-data
    flip (src/savgolFilter.c:773-777), as on the static-config paths.

    The data must cover every window: ``N >= 2*max(half_windows) + 1``
    (checked here when the half-windows are concrete; under an outer trace
    the conservative bound ``N >= 2*MAX_HALF_WINDOW + 1 = 65`` is
    required, since ``lax.dynamic_slice`` would otherwise clamp the edge
    windows and silently corrupt edge outputs).
    """
    hw = jnp.asarray(half_windows)
    po = jnp.asarray(poly_orders)
    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        # promote int/bool input to the sweep's working dtype (casting the
        # float weights DOWN to an int dtype would truncate them to zero)
        x = jnp.asarray(x, dtype=dtype)
    N = x.shape[-1]
    try:
        max_n = int(jnp.max(hw))
    except jax.errors.TracerArrayConversionError:
        max_n = _M
    except jax.errors.ConcretizationTypeError:
        max_n = _M
    if N < 2 * max_n + 1:
        raise ValueError(
            f"data length ({N}) must be >= the widest window "
            f"(2*{max_n}+1 = {2 * max_n + 1})")
    return _apply_sweep_jit(x, hw, po, derivative, boundary, dt_inv, dtype,
                            method, reference_edge_sign)
