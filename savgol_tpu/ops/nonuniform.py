"""Savitzky-Golay filtering of NON-UNIFORMLY sampled signals.

Beyond-reference capability: the C reference (src/savgolFilter.c) and
scipy's ``savgol_filter`` both assume a uniform sample grid — their
precomputed weight tables are only valid for equispaced abscissae. This
module fits the order-``m`` polynomial per output position in the sample's
OWN coordinates ``t`` and evaluates the requested derivative there, so
irregular time series (event data, gappy telemetry, variable-rate sensors)
get the true local-LS estimate instead of a grid approximation.

TPU-first formulation (static shapes, no per-window Python):

1. The window of position ``p`` is its ``2n+1`` INDEX-neighbors
   (edges truncate, exactly like ``savgol_apply_masked``'s
   ``boundary="truncate"``) — index space gives the fixed stencil the
   hardware wants while the VALUES of the abscissae stay arbitrary.
2. Offsets ``u_j = t[p+j] - t[p]`` are normalized per window by
   ``s = max_j |u_j|`` so the Vandermonde design is evaluated on
   ``[-1, 1]`` regardless of the local sampling rate; the fit solves

       min_c sum_j w_j * (x[p+j] - sum_q c_q (u_j/s)^q)^2

   via weighted MOMENT planes: the Gram of the normalized Vandermonde
   is a Hankel of 2m+1 moments per window, accumulated in double-word
   arithmetic and solved by the double-word plane Cholesky (ops/lsq.py)
   — better than Householder QR's ~cond(A)*eps error class, the same
   accuracy story as ``solver="qr"`` on the masked path, with zero
   (window, terms) tensors for the TPU to tile-pad.
3. The d-th derivative at the center is ``c_d * d! / s^d``; positions
   whose window has fewer than ``min_points`` valid samples, or whose
   valid abscissae are numerically non-identifying (e.g. all
   coincident while fitting a slope — detected from diag(R)), yield
   ``fill``.

On a uniform grid this reproduces ``savgol_apply_masked(...,
boundary="truncate")`` exactly, hence the classic filter in the interior.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from savgol_tpu.ops.apply import (_compute_dtype, _move_axis_last,
                                  _restore_axis)

__all__ = ["savgol_apply_nonuniform", "savgol_resample"]


def savgol_apply_nonuniform(
    x: jax.Array,
    t: jax.Array,
    *,
    half_window: int,
    poly_order: int,
    derivative: int = 0,
    mask: Optional[jax.Array] = None,
    axis: int = -1,
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    rcond: Optional[float] = None,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Savitzky-Golay filtering at arbitrary sample positions ``t``.

    ``t`` holds each sample's abscissa (time stamp / spatial coordinate) —
    either shaped like ``x`` or 1D of length ``x.shape[axis]`` (shared
    positions across the batch). The order-``poly_order`` polynomial is
    LS-fit over each sample's ``2*half_window+1`` index-neighbors in the
    sample's own coordinates and ``derivative``-th derivative is returned
    AT each sample's position, in the units of ``t`` (no ``time_step`` —
    the abscissae carry the units). Edges truncate; a bool ``mask`` marks
    valid samples (default ``isfinite(x) & isfinite(t)``), a float
    ``mask`` gives nonnegative per-sample weights (0 = missing), exactly
    as in :func:`savgol_apply_masked`.

    Positions whose window holds fewer than ``min_points`` (default
    ``poly_order + 1``) valid samples — or whose valid abscissae cannot
    identify the polynomial (e.g. coincident time stamps while fitting a
    slope; decided per window from the QR factor's scaled diagonal
    against ``rcond``) — yield ``fill``.

    ``t`` need not be sorted or strictly increasing: the math never
    assumes monotonicity, but the index-neighbor window is only a
    *meaningful* neighborhood when ``t`` is (roughly) ordered.

    ``method``: ``"auto"`` (default) runs the fully-fused Pallas kernel
    on TPU (slab taps + dd Hankel moments + dd plane Cholesky +
    extraction in one VMEM pass; backward through the staged twin) when
    supported (``2*half_window <= 128`` and ``t`` in working
    precision), the staged XLA pipeline otherwise; ``"xla"`` forces the
    staged pipeline; ``"fused"`` forces the kernel (downcasting ``t``
    to working dtype if needed).

    Fully jittable / differentiable (in ``x``, ``t`` and a float
    ``mask``) / vmappable; static args: ``half_window, poly_order,
    derivative, axis, min_points, method``.
    """
    if method not in ("auto", "xla", "fused"):
        raise ValueError(
            f"method must be 'auto', 'xla' or 'fused', got {method!r}")
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
    kmin = m + 1 if min_points is None else int(min_points)
    if kmin < m + 1:
        raise ValueError(
            f"min_points must be >= poly_order + 1, got {kmin}")

    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "non-uniform filtering of complex input: filter real/imag "
            "parts with an explicit shared mask")
    x, restore = _compute_dtype(x)
    t = jnp.asarray(t)
    if not jnp.issubdtype(t.dtype, jnp.floating):
        t = t.astype(x.dtype)
    if t.ndim == 1 and x.ndim > 1:
        shape = [1] * x.ndim
        shape[axis] = t.shape[0]
        t = jnp.broadcast_to(t.reshape(shape), x.shape)
    if t.shape != x.shape:
        raise ValueError(
            f"t shape {t.shape} is neither x's shape {x.shape} nor "
            f"(x.shape[axis],)")
    if mask is None:
        mask = jnp.isfinite(x) & jnp.isfinite(t)
    if mask.shape != x.shape:
        raise ValueError(
            f"mask shape {mask.shape} != data shape {x.shape}")

    xl, moved = _move_axis_last(x, axis)
    tl, _ = _move_axis_last(t, axis)
    ml, _ = _move_axis_last(mask, axis)
    n_out = xl.shape[-1]
    if n_out < 1:
        raise ValueError("data length must be >= 1")

    dtype = xl.dtype
    if rcond is None:
        rcond = 1e-6 if dtype == jnp.float32 else 1e-12
    weighted = not jnp.issubdtype(ml.dtype, jnp.bool_)
    valid = (ml > 0) if weighted else ml
    wts = jnp.where(valid, ml.astype(dtype),
                    jnp.zeros((), dtype)) if weighted else valid.astype(dtype)
    xz = jnp.where(valid, xl, jnp.zeros((), dtype))

    from savgol_tpu.ops.pallas_nonuniform import nonuniform_fused_supported
    if method == "fused" or (method == "auto"
                             and jax.default_backend() == "tpu"
                             and nonuniform_fused_supported(n)
                             and tl.dtype == dtype):
        # ONE fused Pallas kernel: slab-shift taps + dd Hankel moments +
        # dd plane Cholesky + extraction per VMEM tile — the staged form
        # below writes ~2*(3m+2) dd moment/rhs planes to HBM and reads
        # them back. Backward flows through the staged twin.
        op = _nonuni_fused_diff(n, m, d, kmin, repr(float(fill)),
                                float(rcond))
        y = op(xz, wts, tl.astype(dtype))
    else:
        y = _staged_nonuniform(xz, wts, tl, n, m, d, kmin, rcond, fill,
                               dtype)
    y = _restore_axis(y, moved)
    return y.astype(restore) if restore is not None else y


def _staged_nonuniform(xz, wts, tl, n, m, d, kmin, rcond, fill, dtype):
    """Staged XLA nonuniform pipeline — and the fused kernel's
    differentiable jnp twin.

    ``xz``/``wts`` mask-sanitized values and weights, ``tl`` RAW
    abscissae (invalid taps are killed centrally by ``w = 0`` inside
    :func:`_fit_taps`, so NaN/epoch-scale abscissae at masked-out
    samples cannot poison the moments), all (..., N), filter axis last.

    Offsets are formed in t's own dtype: ``u = t[p+j] - t[p]`` before
    any cast kills the catastrophic cancellation large raw abscissae
    (epoch timestamps) would suffer in f32.
    """
    return _fit_taps(_staged_taps(xz, wts, tl, n), 2 * n + 1, m, d,
                     kmin, rcond, fill, dtype)


def _staged_taps(xz, wts, tl, n):
    """Tap accessor over index-window planes (edges truncated).

    Per-tap PLANES via shifted slices — neither a minor-axis gather
    (TPU-serialized) nor a (..., N, ws) window tensor (the ws-minor
    axis tile-pads 25 -> 128, ~5x memory; measured as the path's
    wall)."""
    n_out = xz.shape[-1]
    pad = [(0, 0)] * (xz.ndim - 1) + [(n, n)]
    xzp = jnp.pad(xz, pad)                  # zeros, masked out
    wp = jnp.pad(wts, pad)                  # out-of-range invalid
    tzp = jnp.pad(tl, pad)

    def tap(tt):
        x_t = lax.slice_in_dim(xzp, tt, tt + n_out, axis=-1)
        w_t = lax.slice_in_dim(wp, tt, tt + n_out, axis=-1)
        u_t = lax.slice_in_dim(tzp, tt, tt + n_out, axis=-1) - tl
        return x_t, w_t, u_t

    return tap


@functools.lru_cache(maxsize=None)
def _nonuni_fused_diff(n: int, m: int, d: int, kmin: int, fill: str,
                       rcond: float):
    """Differentiable wrapper for the fused nonuniform Pallas kernel.

    ``fill`` arrives as ``repr(float)`` — NaN is the common value and
    ``nan != nan`` would miss this lru cache AND every jit static-arg
    cache downstream, retracing per call.

    Contract: ``op(xz, wts, tl)`` takes mask-sanitized values
    (invalid = 0), weights (0 = missing) and RAW abscissae, all
    (..., N) in working dtype, and returns the (..., N) d-th
    derivatives at each sample's own abscissa (``fill`` at
    under-quorum / non-identifying positions) — exactly
    :func:`_staged_nonuniform`'s contract (truncate edges). The
    backward pass is the VJP of the staged jnp twin (the same dd
    moments + dd plane Cholesky; ops/lsq.py has one home for the
    math)."""
    fillf = float(fill)

    def twin(xz, wts, tl):
        return _staged_nonuniform(xz, wts, tl, n, m, d, kmin, rcond,
                                  fillf, xz.dtype)

    @jax.custom_vjp
    def op(xz, wts, tl):
        from savgol_tpu.ops.pallas_nonuniform import \
            savgol_nonuniform_fused_pallas
        return savgol_nonuniform_fused_pallas(
            xz, wts, tl, half_window=n, poly_order=m, derivative=d,
            kmin=kmin, fill=fillf, rcond=rcond)

    def fwd(xz, wts, tl):
        return op(xz, wts, tl), (xz, wts, tl)

    def bwd(res, g):
        _, vjp = jax.vjp(twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _fit_taps(tap, ws, m, d, kmin, rcond, fill, dtype):
    """Per-window weighted LS from a TAP ACCESSOR — no window tensors;
    returns the d-th derivative at each window's own center (``fill``
    where under-quorum / non-identifying). See :func:`_fit_coeffs`."""
    coef, s, ok = _fit_coeffs(tap, ws, m, kmin, rcond, dtype)
    # d-th derivative at the evaluation point in t-units: c_d * d! / s^d
    y = coef[d] * (float(math.factorial(d)) / s ** d)
    return jnp.where(ok, y, jnp.asarray(fill, dtype=dtype))


def _fit_coeffs(tap, ws, m, kmin, rcond, dtype):
    """Per-window weighted LS from a TAP ACCESSOR — no window tensors.

    ``tap(t) -> (x_t, w_t, u_t)`` returns the t-th tap of every window
    as (..., P) PLANES: masked values, weights (0 = missing) and
    abscissa offsets from the evaluation point (in t's own dtype —
    cast to working precision AFTER the subtraction so epoch-scale
    abscissae survive f32). Returns ``(coef, s, ok)``: the
    ``(m+1, ..., P)`` polynomial coefficients in the window's
    ``u/s``-normalized coordinates, the ``(..., P)`` normalizers, and
    the ``(..., P)`` quorum-and-identifiability mask.

    TPU-shaped solve: the per-window Gram of the normalized Vandermonde
    is a HANKEL of weighted moments — G[i, j] = S_{i+j} with
    S_p = sum_t w_t (u_t/s)^p — so only 2m+1 unique entries exist per
    window. Two passes over the taps: (1) the per-window normalizer
    s = max_t |u_t| over valid taps plus the quorum count; (2) the
    double-word moment/rhs accumulation (~eps^2 formation, ops/lsq.py),
    solved by the double-word plane Cholesky. No (..., P, ws) window
    tensor (ws-minor tile-pads ~5x) and no (..., ws, k) design tensor
    (~30x; the original batched-QR form measured 0.001 Gs/s on v5e);
    accuracy is better than Householder-QR's cond*eps class for every
    identifiable window.
    """
    from savgol_tpu.ops.lsq import _dd_add, _dd_mul, _split_const
    from savgol_tpu.ops.pallas_solve import plane_cholesky_solve_dd

    # pass 1: normalizer (largest valid |offset|; 1 when all coincide —
    # the m=0 local-mean case stays well-defined) + quorum count
    s = None
    count = None
    for t in range(ws):
        _, w_t, u_t = tap(t)
        valid_t = w_t > 0
        au = jnp.where(valid_t, jnp.abs(u_t), 0)
        s = au if s is None else jnp.maximum(s, au)
        c_t = valid_t.astype(dtype)
        count = c_t if count is None else count + c_t
    s = jnp.where(s > 0, s, 1).astype(dtype)            # (..., P)
    sinv = 1.0 / s
    quorum = count >= kmin

    c = _split_const(dtype)
    zero = jnp.zeros_like(s)
    n_mom = 2 * m + 1
    S = [(zero, zero) for _ in range(n_mom)]            # dd moments
    r = [(zero, zero) for _ in range(m + 1)]            # dd rhs
    for t in range(ws):
        x_t, w_t, u_t = tap(t)
        wx_t = w_t * x_t
        # invalid taps must carry u = 0, not just w = 0: an unsanitized
        # offset (a NaN abscissa at a masked-out sample, or zero padding
        # minus an epoch-scale center) would turn (u/s)^(2m) into
        # inf/NaN and poison the w = 0 moment product with inf * 0 =
        # NaN. The fused Pallas kernel sanitizes identically.
        u_t = jnp.where(w_t > 0, u_t, jnp.zeros((), u_t.dtype))
        un_t = (u_t.astype(dtype) * sinv, zero)
        pw = (jnp.ones_like(s), zero)                   # un_t^p, dd
        for p in range(n_mom):
            S[p] = _dd_add(S[p], _dd_mul(pw, (w_t, zero), c))
            if p <= m:
                r[p] = _dd_add(r[p], _dd_mul(pw, (wx_t, zero), c))
            if p + 1 < n_mom:
                pw = _dd_mul(pw, un_t, c)

    hankel = np.add.outer(np.arange(m + 1), np.arange(m + 1))
    # the dd solver gates on sqrt(rcond) * max|diag L| (diag L ~ singular
    # values of the design); this module's documented rcond acts on those
    # singular values directly, so square it going in
    coef, ok = plane_cholesky_solve_dd(
        jnp.stack([h for h, _ in S]), jnp.stack([l for _, l in S]),
        hankel,
        jnp.stack([h for h, _ in r]), jnp.stack([l for _, l in r]),
        quorum, rcond=float(rcond) ** 2)                # (m+1, ..., P)
    return coef, s, ok


@functools.lru_cache(maxsize=None)
def _nonuni_planes_diff(n: int, m: int, kmin: int, rcond: float):
    """Differentiable wrapper for the plane-emitting fused kernel.

    ``op(xz, wts, tl)`` returns ``(coef, s, okf)`` — the
    :func:`_fit_coeffs` plane stack with the quorum mask as 0/1 floats —
    computed by ONE Pallas pass on TPU
    (pallas_nonuniform.savgol_nonuniform_planes_pallas); backward is the
    VJP of the staged jnp twin (the same dd moments + dd plane
    Cholesky), exactly the :func:`_nonuni_fused_diff` pattern."""

    def twin(xz, wts, tl):
        coef, s, ok = _fit_coeffs(_staged_taps(xz, wts, tl, n),
                                  2 * n + 1, m, kmin, rcond, xz.dtype)
        return coef, s, ok.astype(xz.dtype)

    @jax.custom_vjp
    def op(xz, wts, tl):
        from savgol_tpu.ops.pallas_nonuniform import \
            savgol_nonuniform_planes_pallas
        return savgol_nonuniform_planes_pallas(
            xz, wts, tl, half_window=n, poly_order=m, kmin=kmin,
            rcond=rcond)

    def fwd(xz, wts, tl):
        return op(xz, wts, tl), (xz, wts, tl)

    def bwd(res, g):
        _, vjp = jax.vjp(twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _resample_eval_diff(K: int, d: int, fill: str):
    """Differentiable resample plane evaluation (TPU).

    ``op(bpl, s, ok, t, ctr, tq)`` evaluates the derivative-adjusted
    coefficient planes ``bpl`` (K, B, N) at the query centers:
    clustered (sorted) queries ride the one-hot slab-matmul Pallas
    kernel (ops/pallas_resample.py), arbitrary ones the XLA gathers —
    picked per call by ``lax.cond`` on the block-fit predicate, so
    sparse/shuffled queries stay correct. Backward is the XLA twin's
    VJP. ``fill`` is a repr(float) token (NaN-safe cache key)."""
    fillf = float(fill)

    def xla_eval(bpl, s_pl, ok_pl, tvec, ctr, tq):
        bg = jnp.take(bpl, ctr, axis=-1)            # (K, B, Nq)
        sgth = jnp.take(s_pl, ctr, axis=-1)         # (B, Nq)
        okg = jnp.take(ok_pl, ctr, axis=-1)
        tg = jnp.take(tvec, ctr)
        u = (tq - tg)[None, :] / sgth
        acc = bg[K - 1]
        for j in range(K - 2, -1, -1):
            acc = acc * u + bg[j]
        y = acc / sgth ** d
        return jnp.where(okg > 0.5, y, jnp.asarray(fillf, y.dtype))

    @jax.custom_vjp
    def op(bpl, s_pl, ok_pl, tvec, ctr, tq):
        from savgol_tpu.ops.pallas_resample import (resample_block_fit,
                                                    resample_eval_pallas)
        N = tvec.shape[-1]
        B = s_pl.shape[0]
        fit = resample_block_fit(ctr, N)

        def fast(ops):
            bpl_, s_, ok_, tv_, ctr_, tq_ = ops
            stack = jnp.concatenate(
                [bpl_.reshape(K * B, N), s_, ok_, tv_[None]], axis=0)
            return resample_eval_pallas(stack, ctr_, tq_, K=K, B=B,
                                        derivative=d, fill=fillf)

        return lax.cond(fit, fast, lambda ops: xla_eval(*ops),
                        (bpl, s_pl, ok_pl, tvec, ctr, tq))

    def fwd(*args):
        return op(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(xla_eval, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def savgol_resample(
    x: jax.Array,
    t: jax.Array,
    t_query: jax.Array,
    *,
    half_window: int,
    poly_order: int,
    derivative: int = 0,
    mask: Optional[jax.Array] = None,
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    rcond: Optional[float] = None,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Savitzky-Golay smoothing EVALUATED at arbitrary query positions.

    For each query ``q`` in ``t_query`` the order-``poly_order``
    polynomial is LS-fit to the ``2*half_window + 1`` samples nearest
    ``q`` (by index around ``searchsorted(t, q)``, clipped inside the
    data) and its ``derivative``-th derivative is returned AT ``q`` —
    simultaneous denoising and resampling/interpolation of an
    irregularly sampled series onto any grid, with none of the
    interpolate-then-filter double smoothing. Queries outside
    ``[t[0], t[-1]]`` extrapolate the nearest window's fit.

    ``t`` must be 1D of length ``x.shape[-1]``, SORTED ascending and
    finite (this is what makes the window lookup a searchsorted; use
    :func:`savgol_apply_nonuniform` + a mask for unsorted/NaN abscissae
    after sorting). ``t_query`` is any 1D array; ``x`` may carry leading
    batch axes sharing ``t``. A bool ``mask`` (shaped like ``x`` or 1D
    of length N; default ``isfinite(x)``) marks valid samples, a float
    ``mask`` gives nonnegative weights, with ``min_points`` /
    ``fill`` / ``rcond`` identifiability semantics exactly as in
    :func:`savgol_apply_nonuniform`.

    On a clean uniform grid with ``t_query == t`` the interior
    reproduces the classic filter. Fully jittable / differentiable (in
    ``x``, ``t``, ``t_query`` and a float ``mask``) / vmappable.

    ``method``: ``"auto"`` (default) fits every DATA window once as
    coefficient planes (the shifted-slice pipeline that rides the fused
    dd-moment kernel on TPU) and evaluates each query by gathering ONE
    plane stack at its window center — ~(m+3) position gathers per
    query instead of the direct path's ``3 * (2n+1)``. The window (the
    ``2n+1`` samples around ``searchsorted(t, q)``, clipped inside the
    data) is IDENTICAL to the direct path's; the fit polynomial is the
    same LS solution expressed in the window center's normalized
    coordinates instead of the query's, so values agree to the solver's
    own rounding class (~cond * eps_dd; exact on order-<=m
    polynomials). ``"direct"`` keeps the per-query gather pipeline
    (query-centered normalization — marginally better conditioned for
    far extrapolation, ~10x slower on TPU).
    """
    if method not in ("auto", "direct"):
        raise ValueError(
            f"method must be 'auto' or 'direct', got {method!r}")
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
    kmin = m + 1 if min_points is None else int(min_points)
    if kmin < m + 1:
        raise ValueError(
            f"min_points must be >= poly_order + 1, got {kmin}")

    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise NotImplementedError(
            "resampling of complex input: filter real/imag parts with an "
            "explicit shared mask")
    x, restore = _compute_dtype(x)
    t = jnp.asarray(t)
    tq = jnp.asarray(t_query)
    if not jnp.issubdtype(t.dtype, jnp.floating):
        t = t.astype(x.dtype)
    if not jnp.issubdtype(tq.dtype, jnp.floating):
        tq = tq.astype(t.dtype)
    N = x.shape[-1]
    if t.ndim != 1 or t.shape[0] != N:
        raise ValueError(
            f"t must be 1D of length x.shape[-1]={N}, got {t.shape}")
    if tq.ndim != 1:
        raise ValueError(f"t_query must be 1D, got shape {tq.shape}")
    if N < ws:
        raise ValueError(
            f"data length {N} is shorter than the window {ws}")
    if mask is None:
        mask = jnp.isfinite(x)
    if mask.ndim == 1:
        if mask.shape[0] != N:
            raise ValueError(
                f"1D mask length {mask.shape[0]} != data length {N}")
        mask = jnp.broadcast_to(mask, x.shape)
    if mask.shape != x.shape:
        raise ValueError(
            f"mask shape {mask.shape} != data shape {x.shape}")

    dtype = x.dtype
    if rcond is None:
        rcond = 1e-6 if dtype == jnp.float32 else 1e-12
    weighted = not jnp.issubdtype(mask.dtype, jnp.bool_)
    valid = (mask > 0) if weighted else mask
    wts = jnp.where(valid, mask.astype(dtype),
                    jnp.zeros((), dtype)) if weighted else valid.astype(dtype)
    xz = jnp.where(valid, x, jnp.zeros((), dtype))

    # window of query q: the ws index-neighbors of its insertion point,
    # clipped inside the data (edge queries reuse the first/last window)
    # method="sort" (one XLA merge-sort over t ++ tq) measures 7.5x
    # faster on TPU than the default binary-search scan, whose log2(N)
    # serialized minor-axis gather steps were THE wall of this path
    # (17 of 27 ms on the 8x131k probe); identical insertion points
    ins = jnp.searchsorted(t, tq, method="sort")        # (Nq,)
    start = jnp.clip(ins - n, 0, N - ws)

    if method == "auto":
        # Recentered plane evaluation: fit every data window ONCE
        # (coefficient planes over the clipped centers ride the same
        # shifted-slice pipeline as savgol_apply_nonuniform — the fused
        # dd-moment Pallas kernel's staged twin), then gather one
        # plane stack per query and Horner-evaluate. Same window,
        # same LS fit, different (window-centered) basis.
        ctr = start + n                                 # in [n, N-1-n]
        tb = jnp.broadcast_to(t, x.shape)
        from savgol_tpu.ops.pallas_nonuniform import \
            nonuniform_fused_supported
        if (jax.default_backend() == "tpu"
                and nonuniform_fused_supported(n) and t.dtype == dtype):
            # ONE fused Pallas pass for the whole plane fit (dd moments
            # + dd plane Cholesky, emit_planes mode) — the staged form
            # below round-trips every moment/rhs plane through HBM
            op_fit = _nonuni_planes_diff(n, m, kmin, float(rcond))
            coef, s_pl, ok_pl = op_fit(xz, wts, tb.astype(dtype))
        else:
            coef, s_pl, ok_pl = _fit_coeffs(
                _staged_taps(xz, wts, tb, n), ws, m, kmin, rcond, dtype)
        K = m + 1 - d
        if jax.default_backend() == "tpu" and t.dtype == dtype:
            # one-hot slab-matmul gather kernel for clustered (sorted)
            # queries, XLA gathers via lax.cond otherwise
            # (ops/pallas_resample.py); backward through the XLA twin
            lead = x.shape[:-1]
            B = 1
            for s_ in lead:
                B *= int(s_)
            bpl = jnp.stack([
                coef[j + d] * float(math.factorial(j + d)
                                    // math.factorial(j))
                for j in range(K)])                     # (K, ..., N)
            op = _resample_eval_diff(K, d, repr(float(fill)))
            y = op(bpl.reshape(K, B, N), s_pl.reshape(B, N),
                   ok_pl.astype(dtype).reshape(B, N), t.astype(dtype),
                   ctr.astype(jnp.int32), tq.astype(dtype))
            y = y.reshape(lead + (tq.shape[0],))
            return y.astype(restore) if restore is not None else y
        ck = jnp.take(coef, ctr, axis=-1)               # (m+1, ..., Nq)
        sg = jnp.take(s_pl, ctr, axis=-1)               # (..., Nq)
        okg = jnp.take(ok_pl, ctr, axis=-1)
        # query offset in t's own dtype FIRST (epoch-scale abscissae)
        uq = ((tq - jnp.take(t, ctr)).astype(dtype) / sg)
        # d-th t-derivative of p(u) = sum_k c_k u^k at u, via Horner:
        #   sum_{k>=d} c_k * k!/(k-d)! * u^(k-d) / s^d
        acc = ck[m] * float(math.factorial(m)
                            // math.factorial(m - d))
        for k in range(m - 1, d - 1, -1):
            acc = acc * uq + ck[k] * float(math.factorial(k)
                                           // math.factorial(k - d))
        y = acc / sg ** d
        y = jnp.where(okg, y, jnp.asarray(fill, dtype=dtype))
        return y.astype(restore) if restore is not None else y

    # method="direct": per-tap PLANES via one gather per tap — a
    # (..., Nq, ws) window tensor would tile-pad its ws-minor axis
    # 25 -> 128 on TPU
    def tap(tt):
        idx = start + tt                                # (Nq,)
        x_t = jnp.take(xz, idx, axis=-1)                # (..., Nq)
        w_t = jnp.take(wts, idx, axis=-1)
        # offsets in t's own dtype first (epoch-scale abscissae); the
        # working-precision cast happens inside _fit_coeffs
        u_t = jnp.broadcast_to(jnp.take(t, idx, axis=0) - tq, x_t.shape)
        return x_t, w_t, u_t

    y = _fit_taps(tap, ws, m, d, kmin, rcond, fill, dtype)
    return y.astype(restore) if restore is not None else y
