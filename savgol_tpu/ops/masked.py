"""Missing-data (masked / NaN-robust) Savitzky-Golay filtering.

Beyond-reference capability: the C reference (src/savgolFilter.c) and scipy
both assume every window sample is present; one NaN poisons a whole window
span. This module fits the order-``m`` polynomial per output position using
ONLY the valid samples in the window — the estimator degrades gracefully
under dropouts and recovers the classic filter exactly when nothing is
missing.

TPU-first formulation (no per-window loop, no dynamic shapes):

1. Build an ORTHONORMAL polynomial basis ``phi_0..phi_m`` for the full
   window on the host (f64 QR of the Vandermonde on t = j/n). Orthonormality
   makes the all-valid Gram matrix the identity, so the per-position solves
   stay well-conditioned in f32 for any mostly-valid mask.
2. The masked normal equations at position p are

       G[a,b] = sum_j mask[p+j] * phi_a(t_j) * phi_b(t_j)
       r[a]   = sum_j mask[p+j] * phi_a(t_j) * x[p+j]

   Every entry is a fixed-stencil correlation: G needs the
   (m+1)(m+2)/2 pair-product kernels ``phi_a*phi_b`` against the MASK,
   ``r`` needs the m+1 basis kernels against the masked input. Both ride
   the same K-stencil bank kernels as ``SavgolBank`` (one input pass on
   the MXU for all K stencils).
3. One (m+1)x(m+1) SPD solve per position, executed on the Gram ENTRY
   PLANES (ops/lsq.py, ops/pallas_solve.py): the tiny system is never
   materialized with (k, k) minor dims — TPU tiling pads those ~30-40x
   (a measured 34 GB HBM allocation for a 0.8 GB logical tensor) — and
   the unrolled Cholesky + compensated refinement runs as fused
   elementwise ops (one Pallas VMEM pass on TPU). The
   derivative-at-center row extracts the output; positions with fewer
   than ``min_points`` valid samples are filled with ``fill`` (default
   NaN) through a safe-solve select.

Accuracy note: the normal equations square the masked design's condition
number; the compensated refinement removes the SOLVE's share of that
(converging to the exact solution of the stored (G, r)), leaving the
Gram FORMATION error ~cond(A)^2 * ws * eps — in f32 a hole-starved edge
window (cond(A) ~ 1e3) can still lose ~1e-2 relative accuracy.
``solver="qr"`` forms G and r in compensated double-word arithmetic and
solves in the double-word plane Cholesky — error below Householder QR's
cond(A)*eps class for every window up to cond ~ 1/eps (measured 1.1e-5
vs f64 lstsq through exactly-determined hole-starved windows), on the
same plane-shaped pipeline at ~3-5x the cost. The default
``solver="normal"`` stays on the fixed-stencil MXU bank path.

Edge handling: ``boundary="truncate"`` (default) treats out-of-range
samples as missing, i.e. the edge fit uses exactly the in-range valid
samples — the masked-LS generalization of the reference's edge-row fits.
Any pad-based BoundaryMode works too (the mask is padded consistently).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from savgol_tpu.config import (PAD_MODE, Boundary2D, BoundaryMode,
                               Savgol2DConfig, num_terms_2d)
from savgol_tpu.ops.apply import (_compute_dtype, _move_axis_last,
                                  _restore_axis, correlate_valid)
from savgol_tpu.ops.pallas_solve import (plane_cholesky_solve,
                                         plane_cholesky_solve_dd)

__all__ = ["savgol_apply_masked", "savgol2d_apply_masked"]

TRUNCATE = "truncate"


@functools.lru_cache(maxsize=None)
def _masked_tables(half_window: int, poly_order: int):
    """Host-precomputed f64 tables for the masked fit.

    Returns ``(Q, Rinv, pair_w, pair_index)``:
      Q          (ws, m+1)  orthonormal basis sampled on the window,
      Rinv       (m+1, m+1) monomial coefficients of each basis column,
      pair_w     (Kp, ws)   pair-product stencils phi_a*phi_b, a<=b,
      pair_index (m+1, m+1) symmetric gather map into the Kp axis.
    """
    n = int(half_window)
    m = int(poly_order)
    ws = 2 * n + 1
    t = (np.arange(ws, dtype=np.float64) - n) / max(n, 1)
    V = np.vander(t, m + 1, increasing=True)            # V[j, q] = t_j^q
    Q, R = np.linalg.qr(V)                              # Q: (ws, m+1)
    # deterministic sign: positive leading coefficient per column
    s = np.sign(np.diag(R)).copy()
    s[s == 0] = 1.0
    Q = Q * s
    R = R * s[:, None]
    Rinv = np.linalg.solve(R, np.eye(m + 1))            # phi_a = sum_q Rinv[q,a] t^q
    pairs = []
    pair_index = np.zeros((m + 1, m + 1), dtype=np.int32)
    for a in range(m + 1):
        for b in range(a, m + 1):
            pair_index[a, b] = pair_index[b, a] = len(pairs)
            pairs.append(Q[:, a] * Q[:, b])
    pair_w = np.stack(pairs)                            # (Kp, ws)
    return Q, Rinv, pair_w, pair_index


def _bank_correlate(xp: jax.Array, w: jax.Array,
                    precision=lax.Precision.HIGHEST,
                    method: str = "auto") -> jax.Array:
    """K-stencil valid correlation, (..., Npad) x (K, ws) -> (K, ..., Nout).

    Same dispatch as SavgolBank.apply: the Pallas bank kernels share one
    input pass on TPU; elsewhere (or with ``method="xla"``) a vmapped
    XLA conv."""
    if method == "auto" and jax.default_backend() == "tpu":
        from savgol_tpu.ops import pallas_conv as pc
        B = 1
        for s in xp.shape[:-1]:
            B *= s
        if B >= pc._BANK_MXU_MIN_BATCH:
            return pc.correlate_valid_bank_pallas_mxu(xp, w.astype(xp.dtype))
        return pc.correlate_valid_bank_pallas(xp, w.astype(xp.dtype))
    return jax.vmap(lambda wk: correlate_valid(xp, wk, precision))(
        w.astype(xp.dtype))


@functools.lru_cache(maxsize=None)
def _masked1d_fused_diff(n: int, m: int, d: int, kmin: int, fill: str,
                         dt: float):
    """Differentiable wrapper for the fused masked-1D Pallas kernel.

    ``fill`` is passed as ``repr(float)`` — NaN is the common value and
    ``nan != nan`` would miss this lru cache AND every jit static-arg
    cache downstream, retracing per call.

    Contract: ``op(xv, wv)`` takes mask-sanitized values (invalid = 0)
    and weights, (..., L), and returns the (..., L) truncate-semantics
    masked filter output (``fill`` under quorum). The backward pass is
    the VJP of the staged jnp twin (bank correlations + plane Cholesky —
    the exact same math, ops/lsq.py has one home for it)."""
    fillf = float(fill)
    Q, Rinv, pair_w, pair_index = _masked_tables(n, m)
    extract = Rinv[d, :] * math.factorial(d) / float(n * dt) ** d
    ws = 2 * n + 1

    def twin(xv, wv):
        from savgol_tpu.ops.lsq import cholesky_solve_planes
        dtype = xv.dtype
        pad = [(0, 0)] * (xv.ndim - 1) + [(n, n)]
        wpp = jnp.pad(wv, pad)
        xpp = jnp.pad(xv * wv, pad)
        gram = _bank_correlate(wpp, jnp.asarray(pair_w, dtype))
        rhs = _bank_correlate(xpp, jnp.asarray(Q.T, dtype))
        ones = jnp.ones((1, ws), dtype)
        count = _bank_correlate(
            jnp.pad((wv > 0).astype(dtype), pad), ones)[0]
        coef, ok = cholesky_solve_planes(gram, pair_index, rhs,
                                         count >= (kmin - 0.5))
        y = jnp.einsum("k...,k->...", coef,
                       jnp.asarray(extract, dtype=dtype))
        return jnp.where(ok, y, jnp.asarray(fillf, dtype=dtype))

    @jax.custom_vjp
    def op(xv, wv):
        from savgol_tpu.ops.pallas_masked import \
            savgol_masked1d_fused_pallas
        return savgol_masked1d_fused_pallas(
            xv, wv, pair_w, Q.T, extract, half_window=n, kmin=kmin,
            fill=fillf)

    def fwd(xv, wv):
        return op(xv, wv), (xv, wv)

    def bwd(res, g):
        _, vjp = jax.vjp(twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def savgol_apply_masked(
    x: jax.Array,
    *,
    half_window: int,
    poly_order: int,
    derivative: int = 0,
    time_step: float = 1.0,
    mask: Optional[jax.Array] = None,
    boundary: Union[str, BoundaryMode] = TRUNCATE,
    axis: int = -1,
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    solver: str = "normal",
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Savitzky-Golay filtering with missing samples, along ``axis``.

    A bool ``mask`` marks VALID samples (True = use); default
    ``isfinite(x)``, so NaN/Inf-holed signals work out of the box. A
    float ``mask`` is NONNEGATIVE per-sample weights for a weighted LS
    fit (0 = missing; e.g. inverse noise variances) — an all-ones weight
    vector equals the bool all-valid fit. Positions whose window holds
    fewer than ``min_points`` (default ``poly_order + 1``)
    positive-weight samples yield ``fill``. With an all-valid mask and a
    pad boundary the result equals the classic filter; on an order-<=m
    polynomial the exact d-th derivative is reproduced wherever the fit
    is determined, holes and truncated edges included.

    ``solver="normal"`` (default) assembles masked normal equations from
    fixed-stencil correlations (fast, MXU bank kernels on TPU);
    ``solver="qr"`` QR-factors the masked window design per position for
    full working-precision accuracy on ill-conditioned (hole-starved /
    truncated) windows, at ~window-size-times the memory.

    Fully jittable / differentiable / vmappable; static args:
    ``half_window, poly_order, derivative, boundary, axis, min_points,
    solver``.
    """
    n = int(half_window)
    m = int(poly_order)
    d = int(derivative)
    ws = 2 * n + 1
    if n < 1:
        raise ValueError(f"half_window must be >= 1, got {n}")
    if not 0 <= m <= 2 * n:
        raise ValueError(
            f"poly_order must be in [0, 2*half_window], got {m}")
    if not 0 <= d <= m:
        raise ValueError(
            f"derivative must be in [0, poly_order], got {d}")
    dt = float(time_step)
    if dt <= 0.0:
        raise ValueError(f"time_step must be positive, got {time_step}")
    if solver not in ("normal", "qr"):
        raise ValueError(f"solver must be 'normal' or 'qr', got {solver!r}")
    if method not in ("auto", "xla"):
        raise ValueError(f"method must be 'auto' or 'xla', got {method!r}")
    kmin = m + 1 if min_points is None else int(min_points)
    if kmin < m + 1:
        raise ValueError(
            f"min_points must be >= poly_order + 1, got {kmin}")
    truncate = (isinstance(boundary, str)
                and boundary.lower() == TRUNCATE)
    if not truncate:
        boundary = BoundaryMode(boundary)
        if boundary is BoundaryMode.POLYNOMIAL:
            raise ValueError(
                "boundary='truncate' is the masked-fit analog of the "
                "POLYNOMIAL edge rule; POLYNOMIAL itself is pad-free")

    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "masked filtering of complex input: filter real/imag parts "
            "with an explicit shared mask")
    x, restore = _compute_dtype(x)
    if mask is None:
        mask = jnp.isfinite(x)
    if mask.shape != x.shape:
        raise ValueError(
            f"mask shape {mask.shape} != data shape {x.shape}")

    xl, moved = _move_axis_last(x, axis)
    ml, _ = _move_axis_last(mask, axis)
    if xl.shape[-1] < 1:
        raise ValueError("data length must be >= 1")

    Q, Rinv, pair_w, pair_index = _masked_tables(n, m)
    dtype = xl.dtype
    # A bool mask marks validity; any other dtype is NONNEGATIVE per-sample
    # weights for a weighted LS fit (0 = missing). The quorum counts
    # positive-weight samples either way.
    weighted = not jnp.issubdtype(ml.dtype, jnp.bool_)
    valid = (ml > 0) if weighted else ml
    wts = jnp.where(valid, ml.astype(dtype),
                    jnp.zeros((), dtype)) if weighted else valid.astype(dtype)
    xz = jnp.where(valid, xl, jnp.zeros((), dtype))     # NaNs never enter
    pad = [(0, 0)] * (xl.ndim - 1) + [(n, n)]
    if truncate:
        xzp = jnp.pad(xz, pad)                          # zeros, masked out
        wp = jnp.pad(wts, pad)                          # out-of-range invalid
    else:
        # Pad the zero-holed data AND the mask with the same mode: a pad
        # sample mirrors/replicates both the value and the VALIDITY/weight
        # of its source sample (CONSTANT here is the reference's
        # edge-replication, config.PAD_MODE -> "edge" — an invalid edge
        # stays invalid).
        mode = PAD_MODE[boundary]
        xzp = jnp.pad(xz, pad, mode=mode)
        wp = jnp.pad(wts, pad, mode=mode)

    if solver == "qr":
        # Accuracy mode, PLANE-shaped: compensated (double-word) Gram and
        # rhs formation + double-word plane Cholesky (ops/lsq.py). The
        # solution error is ~cond(G) * eps_dd (eps_dd ~ 2^-48 in f32) —
        # below Householder QR's cond(A) * eps for every window the mode
        # exists for, including exactly-determined hole-starved ones
        # (cond(A) ~ 1e5). The former design-tensor QR measured 0.001
        # Gs/s on v5e: its (ws, m+1) minor dims tile-pad ~30x and batched
        # tiny QR serializes; this form is the same bank-plane pipeline
        # as solver="normal" at ~eps^2 precision. (Weighted fits round
        # the x*w product once in working precision before the
        # compensated accumulation — one eps of irreducible data error.)
        from savgol_tpu.ops.lsq import correlate_valid_dd
        gram_hi, gram_lo = correlate_valid_dd(wp, pair_w)
        rhs_hi, rhs_lo = correlate_valid_dd(
            xzp * wp if weighted else xzp, Q.T)
        if weighted:
            ones = np.ones((1, ws))
            count = correlate_valid_dd((wp > 0).astype(dtype), ones)[0][0]
        else:
            count = gram_hi[pair_index[0, 0]] * ws
        ok = count >= (kmin - 0.5)
        coef, ok = plane_cholesky_solve_dd(
            gram_hi, gram_lo, pair_index, rhs_hi, rhs_lo, ok)
    elif method == "auto" and jax.default_backend() == "tpu":
        # ONE fused Pallas kernel: gram/rhs/count matmuls + plane solve +
        # extraction per VMEM tile — the staged form below writes ~20
        # Gram/rhs planes to HBM and reads them back (~170 B/sample vs
        # the kernel's ~13). Backward flows through the staged twin.
        op = _masked1d_fused_diff(n, m, d, kmin, repr(float(fill)), dt)
        y = op(xzp, wp)[..., n:-n]
        y = _restore_axis(y, moved)
        return y.astype(restore) if restore is not None else y
    else:
        qw = jnp.asarray(Q.T, dtype=dtype)              # (m+1, ws)
        pw = jnp.asarray(pair_w, dtype=dtype)           # (Kp, ws)
        gram = _bank_correlate(wp, pw, precision, method)    # (Kp, ..., N)
        rhs = _bank_correlate(xzp * wp if weighted else xzp,
                              qw, precision, method)         # (m+1, ..., N)

        if weighted:
            # positive-weight count needs its own box correlation (the
            # Gram's phi_0 row carries the weight SUM, not the count)
            ones = jnp.ones((1, ws), dtype)
            ind = (wp > 0).astype(dtype)
            count = _bank_correlate(ind, ones, precision, method)[0]
        else:
            # phi_0 is the constant 1/sqrt(ws): G[0,0] == count/ws exactly
            count = gram[pair_index[0, 0]] * ws
        ok = count >= (kmin - 0.5)                      # robust int compare
        # per-position k x k solve on ENTRY PLANES (ops/lsq.py) — a
        # (..., N, k, k) Gram tensor would be tile-padded 41x on TPU
        coef, ok = plane_cholesky_solve(gram, pair_index, rhs, ok)

    # d-th derivative at the window center, in user units:
    #   y = sum_a coef_a * phi_a^(d)(0) / (n*dt)^d,  phi_a^(d)(0) = d! Rinv[d,a]
    # (coef is in PLANES layout (m+1, ..., N) from both solvers)
    extract = Rinv[d, :] * math.factorial(d) / float(n * dt) ** d
    y = jnp.einsum("k...,k->...", coef,
                   jnp.asarray(extract, dtype=dtype),
                   precision=precision)
    y = jnp.where(ok, y, jnp.asarray(fill, dtype=dtype))
    y = _restore_axis(y, moved)
    return y.astype(restore) if restore is not None else y


# ---------------------------------------------------------------------------
# 2D: masked bivariate fits
# ---------------------------------------------------------------------------

_STACK2D_CHUNK = 4   # stencils per stack-kernel launch: bands are
                     # (K, wh, 256, 128) in VMEM — 4 x 11-row stencils
                     # ~ 5.6 MB, inside the budget


def _corr2d_bank(x: jax.Array, w_stack: jax.Array,
                 precision=lax.Precision.HIGHEST,
                 method: str = "auto") -> jax.Array:
    """(..., Rp, Cp) x (K, wh, ww) -> (K, ..., R, C) valid correlation,
    PLANES-FIRST.

    On TPU this rides the K-chunked row-banded MXU stack kernel: its
    output is natively plane-major AND it measured 3x the 65-channel
    XLA conv (55 vs 19 Mpix/s) — but the decisive reason is LAYOUT: the
    XLA conv materializes its output feature-minor, and re-laying
    65 planes out for the Pallas solve measured ~250 ms/Mpix (the whole
    masked-2D wall; benchmarks/probe_masked2d_stages.py). Elsewhere (or
    for stencils beyond the kernel's halo limits) the XLA conv + a
    moveaxis serve."""
    if method == "auto" and jax.default_backend() == "tpu":
        from savgol_tpu.ops import pallas_conv as pc
        K, wh, ww = w_stack.shape
        if wh <= pc._HALO_R + 1 and ww <= pc._LANES + 1:
            outs = [pc.correlate2d_valid_pallas_rowmxu_stack(
                x, w_stack[s:s + _STACK2D_CHUNK])
                for s in range(0, K, _STACK2D_CHUNK)]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs,
                                                                  axis=0)
    from savgol_tpu.ops.apply2d import correlate2d_valid
    return jnp.moveaxis(correlate2d_valid(x, w_stack, precision), -3, 0)


@functools.lru_cache(maxsize=None)
def _masked_tables_2d(half_window_x: int, half_window_y: int,
                      poly_order: int):
    """Host-precomputed f64 tables for the masked 2D fit.

    Basis: QR-orthonormalized bivariate monomials x^i y^j (i + j <= m) on
    the window grid t = offset/half_window. Returns
    ``(Q3, Rinv, pair_w, pair_index, mono_index)``:
      Q3         (P, wy, wx)   orthonormal basis stencils,
      Rinv       (P, P)        monomial coefficients of each basis fn,
      pair_w     (Kp, wy, wx)  pair products phi_a*phi_b, a<=b,
      pair_index (P, P)        symmetric gather map into the Kp axis,
      mono_index dict (i, j) -> monomial row in Rinv.
    """
    nx, ny, m = int(half_window_x), int(half_window_y), int(poly_order)
    wx, wy = 2 * nx + 1, 2 * ny + 1
    tx = (np.arange(wx, dtype=np.float64) - nx) / max(nx, 1)
    ty = (np.arange(wy, dtype=np.float64) - ny) / max(ny, 1)
    monos = [(i, t - i) for t in range(m + 1) for i in range(t + 1)]
    mono_index = {ij: p for p, ij in enumerate(monos)}
    P = len(monos)
    TY, TX = np.meshgrid(ty, tx, indexing="ij")
    V = np.stack([(TX ** i * TY ** j).reshape(-1) for i, j in monos],
                 axis=1)                                 # (wy*wx, P)
    Q, R = np.linalg.qr(V)
    s = np.sign(np.diag(R)).copy()
    s[s == 0] = 1.0
    Q = Q * s
    R = R * s[:, None]
    Rinv = np.linalg.solve(R, np.eye(P))
    pairs = []
    pair_index = np.zeros((P, P), dtype=np.int32)
    for a in range(P):
        for b in range(a, P):
            pair_index[a, b] = pair_index[b, a] = len(pairs)
            pairs.append(Q[:, a] * Q[:, b])
    pair_w = np.stack(pairs).reshape(-1, wy, wx)         # (Kp, wy, wx)
    Q3 = Q.T.reshape(P, wy, wx)
    return Q3, Rinv, pair_w, pair_index, mono_index


@functools.lru_cache(maxsize=None)
def _masked2d_fused_diff(nx: int, ny: int, m: int, dx: int, dy: int,
                         delta_x: float, delta_y: float, kmin: int,
                         fill: str, rcond: float, weighted: bool):
    """Differentiable wrapper for the fused masked-2D Pallas kernel
    (ops/pallas_masked2d.py): separable tensor-moment Gram + plane
    Cholesky + extraction in one VMEM pass. The backward pass is the VJP
    of the staged jnp twin below — same mathematical function (the
    masked-LS fit is basis-independent), one home for the math.

    ``fill`` arrives as ``repr(float)`` (NaN-safe cache key, see the 1D
    wrapper). Contract: ``op(xv, wv)`` takes the BOUNDARY-PADDED
    mask-sanitized values (pre-multiplied by the weights when
    ``weighted``) and weights, (..., R + 2ny, C + 2nx), and returns the
    (..., R, C) masked filter output with ``fill`` at under-quorum /
    unidentifiable pixels."""
    fillf = float(fill)
    wx, wy = 2 * nx + 1, 2 * ny + 1
    Q3, Rinv, pair_w, pair_index, mono_index = _masked_tables_2d(nx, ny, m)
    p_idx = mono_index[(dx, dy)]
    scale = (math.factorial(dx) * math.factorial(dy)
             / float(nx * delta_x) ** dx / float(ny * delta_y) ** dy)
    extract = Rinv[p_idx, :] * scale

    def twin(xv, wv):
        dtype = xv.dtype
        gramP = _corr2d_bank(wv, jnp.asarray(pair_w, dtype))
        rhsP = _corr2d_bank(xv, jnp.asarray(Q3, dtype))
        if weighted:
            ones = jnp.ones((1, wy, wx), dtype)
            count = _corr2d_bank((wv > 0).astype(dtype), ones)[0]
        else:
            count = gramP[pair_index[0, 0]] * (wy * wx)
        coef, ok = plane_cholesky_solve(gramP, pair_index, rhsP,
                                        count >= (kmin - 0.5), rcond=rcond)
        y = jnp.einsum("k...,k->...", coef,
                       jnp.asarray(extract, dtype=dtype))
        return jnp.where(ok, y, jnp.asarray(fillf, dtype=dtype))

    @jax.custom_vjp
    def op(xv, wv):
        from savgol_tpu.ops.pallas_masked2d import \
            savgol_masked2d_fused_pallas
        return savgol_masked2d_fused_pallas(
            xv, wv, half_window_x=nx, half_window_y=ny, poly_order=m,
            deriv_x=dx, deriv_y=dy, delta_x=delta_x, delta_y=delta_y,
            kmin=kmin, fill=fillf, rcond=rcond, weighted=weighted)

    def fwd(xv, wv):
        return op(xv, wv), (xv, wv)

    def bwd(res, g):
        _, vjp = jax.vjp(twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def savgol2d_apply_masked(
    x: jax.Array,
    *,
    half_window_x: int,
    half_window_y: int,
    poly_order: int,
    deriv_x: int = 0,
    deriv_y: int = 0,
    delta_x: float = 1.0,
    delta_y: float = 1.0,
    mask: Optional[jax.Array] = None,
    boundary: Union[str, Boundary2D] = TRUNCATE,
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    rcond: Optional[float] = None,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """2D Savitzky-Golay filtering with missing pixels (last two axes).

    The bivariate order-``poly_order`` polynomial is fit per pixel using
    ONLY the valid samples in the window (bool ``mask`` defaults to
    ``isfinite(x)``; a float ``mask`` is nonnegative per-pixel weights
    for a weighted fit, 0 = missing); the requested mixed partial is
    evaluated at the window center. Beyond both the reference
    (src/savgol2d.c) and scipy: one NaN there poisons every window that
    touches it.

    Well-posedness is decided PER PIXEL, numerically: a window needs
    ``min_points`` (default: the number of polynomial terms) valid
    samples AND a Cholesky-factorable masked Gram matrix whose scaled
    diagonal clears ``rcond`` (default: dtype-based) — degenerate valid
    sets (e.g. all on one row while fitting y-dependence) yield ``fill``
    instead of garbage. This is the per-pixel analog of the global
    singular-geometry rule in ``ops/weights.py::savgol2d_weights_np``.

    ``boundary="truncate"`` (default) treats out-of-range pixels as
    missing; ``Boundary2D.CONSTANT`` (edge) / ``REFLECT`` / ``PERIODIC``
    (wrap) pad value and validity consistently. VALID is not offered —
    truncate at same size generalizes it (crop the output if needed).

    Fully jittable / differentiable / vmappable.
    """
    # reference-consistent static validation (caps, window area >= terms)
    cfg = Savgol2DConfig(half_window_x, half_window_y, poly_order,
                         deriv_x=deriv_x, deriv_y=deriv_y,
                         delta_x=delta_x, delta_y=delta_y)
    nx, ny, m = cfg.half_window_x, cfg.half_window_y, cfg.poly_order
    wx, wy = 2 * nx + 1, 2 * ny + 1
    nterms = num_terms_2d(m)
    kmin = nterms if min_points is None else int(min_points)
    if kmin < nterms:
        raise ValueError(
            f"min_points must be >= the number of polynomial terms "
            f"({nterms}), got {kmin}")
    truncate = (isinstance(boundary, str)
                and boundary.lower() == TRUNCATE)
    if not truncate:
        boundary = Boundary2D(boundary)
        if boundary is Boundary2D.VALID:
            raise ValueError(
                "boundary='valid' is not offered on the masked 2D path: "
                "'truncate' generalizes it (crop the output if needed)")

    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "masked 2D filtering of complex input: filter real/imag "
            "parts with an explicit shared mask")
    if x.ndim < 2:
        raise ValueError("2D filtering needs at least a 2D array")
    x, restore = _compute_dtype(x)
    if mask is None:
        mask = jnp.isfinite(x)
    if mask.shape != x.shape:
        raise ValueError(
            f"mask shape {mask.shape} != data shape {x.shape}")
    if method not in ("auto", "xla"):
        raise ValueError(f"method must be 'auto' or 'xla', got {method!r}")
    dtype = x.dtype
    if rcond is None:
        rcond = 1e-6 if dtype == jnp.float32 else 1e-12

    Q3, Rinv, pair_w, pair_index, mono_index = _masked_tables_2d(nx, ny, m)
    # bool mask = validity; any other dtype = NONNEGATIVE per-pixel weights
    # for a weighted LS fit (0 = missing), as on the 1D path
    weighted = not jnp.issubdtype(mask.dtype, jnp.bool_)
    valid = (mask > 0) if weighted else mask
    wts = jnp.where(valid, mask.astype(dtype),
                    jnp.zeros((), dtype)) if weighted else valid.astype(dtype)
    xz = jnp.where(valid, x, jnp.zeros((), dtype))
    pad = [(0, 0)] * (x.ndim - 2) + [(ny, ny), (nx, nx)]
    if truncate:
        xzp = jnp.pad(xz, pad)
        wp = jnp.pad(wts, pad)
    else:
        # pads inherit both the value and the VALIDITY/weight of their
        # source
        from savgol_tpu.ops.apply2d import _PAD_MODE_2D
        mode = _PAD_MODE_2D[boundary]
        xzp = jnp.pad(xz, pad, mode=mode)
        wp = jnp.pad(wts, pad, mode=mode)

    from savgol_tpu.ops.pallas_masked2d import fused2d_supported
    if (method == "auto" and jax.default_backend() == "tpu"
            and fused2d_supported(nx, ny, m)):
        # ONE fused Pallas kernel: separable tensor-moment Gram + plane
        # Cholesky + extraction per VMEM tile (ops/pallas_masked2d.py) —
        # the staged form below launches ~(Kp + P) / 4 stack-kernel
        # chunks and round-trips every Gram/rhs plane through HBM.
        # Backward flows through the staged twin.
        op = _masked2d_fused_diff(nx, ny, m, int(deriv_x), int(deriv_y),
                                  float(delta_x), float(delta_y), kmin,
                                  repr(float(fill)), float(rcond),
                                  weighted)
        y = op(xzp * wp if weighted else xzp, wp)
        return y.astype(restore) if restore is not None else y

    pw = jnp.asarray(pair_w, dtype=dtype)
    qw = jnp.asarray(Q3, dtype=dtype)
    # planes-first layout everywhere: the per-pixel P x P Gram is NEVER
    # materialized with (P, P) minor dims (TPU tile-padding would blow
    # it up ~20x at P = 10 — see ops/lsq.py::cholesky_solve_planes)
    gramP = _corr2d_bank(wp, pw, precision, method)      # (Kp, ..., R, C)
    rhsP = _corr2d_bank(xzp * wp if weighted else xzp,
                        qw, precision, method)           # (P, ..., R, C)

    if weighted:
        # positive-weight count needs its own box correlation (the Gram's
        # phi_0 row carries the weight SUM, not the count)
        ones = jnp.ones((1, wy, wx), dtype)
        count = _corr2d_bank((wp > 0).astype(dtype), ones, precision,
                             method)[0]
    else:
        # phi_0 is the constant 1/sqrt(wy*wx): G[0,0] == count/(wy*wx)
        count = gramP[pair_index[0, 0]] * (wy * wx)
    quorum = count >= (kmin - 0.5)
    # Cholesky on entry planes; rcond gates per-pixel identifiability
    # (degenerate valid sets -> fill), NaN-safe substitution inside
    coef, ok = plane_cholesky_solve(gramP, pair_index, rhsP, quorum,
                                     rcond=rcond)        # (P, ..., R, C)

    p_idx = mono_index[(int(deriv_x), int(deriv_y))]
    scale = (math.factorial(deriv_x) * math.factorial(deriv_y)
             / float(nx * delta_x) ** deriv_x
             / float(ny * delta_y) ** deriv_y)
    extract = Rinv[p_idx, :] * scale
    y = jnp.einsum("k...,k->...", coef, jnp.asarray(extract, dtype=dtype),
                   precision=precision)
    y = jnp.where(ok, y, jnp.asarray(fill, dtype=dtype))
    return y.astype(restore) if restore is not None else y
