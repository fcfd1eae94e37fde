"""Savitzky-Golay weight generation — vectorized, works on host (numpy/f64)
and on device (jax, jittable, differentiable).

The reference computes one Gram-polynomial value per call with a rolling
3-buffer recurrence (/root/reference/src/savgolFilter.c:236-303) and one
weight per (i, t) pair (/root/reference/src/savgolFilter.c:336-356). Here the
whole table F_k^{(d)}(i) for all k <= m, all d' <= d, all i in [-n, +n] is
built in one shot by running the same three-term recurrence over vectors, and
the centered stencil plus *all* n edge rows fall out of a single einsum.

Math (documented in the reference at src/savgolFilter.c:207-218, 312-318):

  F_0^{(d)}(i)  = [d == 0]
  F_1^{(d)}(i)  = (1/n) * (i * F_0^{(d)}(i) + d * F_0^{(d-1)}(i))
  F_k^{(d)}(i)  = a_k * (i * F_{k-1}^{(d)}(i) + d * F_{k-1}^{(d-1)}(i))
                  - g_k * F_{k-2}^{(d)}(i)
      a_k = (4k - 2) / (k (2n - k + 1))
      g_k = (k - 1)(2n + k) / (k (2n - k + 1))

  w(i, t) = sum_{k=0..m} (2k+1) * GenFact(2n, k) / GenFact(2n+k+1, k+1)
                         * F_k^{(0)}(i) * F_k^{(d)}(t)

where GenFact(a, b) = a (a-1) ... (a-b+1) is the falling factorial. The
reference precomputes GenFact into a 76x76 float table with double
intermediates (/root/reference/src/savgolFilter.c:151-176); on TPU the handful
of values needed per config are just computed directly in f64 (numpy path) or
as trace-time Python floats folded into constants (jax path) — an O(1) lookup
table buys nothing when the whole weight tensor is one fused graph.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from savgol_tpu.config import Savgol2DConfig, SavgolConfig

__all__ = [
    "genfact",
    "gram_poly_table",
    "savgol_weights_np",
    "savgol_weights",
    "savgol_all_weights_np",
    "savgol_all_weights",
    "savgol2d_weights_np",
    "savgol2d_weights",
    "monomial_index",
]


def genfact(a: int, b: int) -> float:
    """Falling factorial GenFact(a, b) = a! / (a-b)! as an exact f64.

    Matches the reference's table entries
    (/root/reference/src/savgolFilter.c:151-176): empty product is 1,
    and b > a yields 0.
    """
    if b > a:
        return 0.0
    out = 1.0
    for j in range(a - b + 1, a + 1):
        out *= float(j)
    return out


def _norm_factors(n: int, m: int) -> np.ndarray:
    """(2k+1) * GenFact(2n,k) / GenFact(2n+k+1,k+1) for k = 0..m, f64."""
    return np.array(
        [(2 * k + 1) * genfact(2 * n, k) / genfact(2 * n + k + 1, k + 1)
         for k in range(m + 1)],
        dtype=np.float64,
    )


def _gram_table(points, n: int, m: int, dmax: int, xp):
    """Gram polynomial table G[k, d, :] = F_k^{(d)}(points).

    ``points`` is a 1D array of evaluation points; ``xp`` is numpy or
    jax.numpy. Loops over k and d are Python-level (static, k <= 10,
    d <= 4) so the jax path traces to a small fused elementwise graph.
    Returns an array of shape (m+1, dmax+1, len(points)).
    """
    i = points
    npts = i.shape[0]
    dtype = i.dtype
    zeros = xp.zeros((npts,), dtype=dtype)
    ones = xp.ones((npts,), dtype=dtype)

    # rows[k][d] : F_k^{(d)} over all points
    row0 = [ones] + [zeros] * dmax
    rows = [row0]
    if m >= 1:
        inv_n = 1.0 / n
        row1 = [inv_n * (i * row0[0])]
        for d in range(1, dmax + 1):
            row1.append(inv_n * (i * row0[d] + d * row0[d - 1]))
        rows.append(row1)
    for k in range(2, m + 1):
        denom = k * (2.0 * n - k + 1.0)
        alpha = (4.0 * k - 2.0) / denom
        gamma = ((k - 1.0) * (2.0 * n + k)) / denom
        prev1, prev2 = rows[k - 1], rows[k - 2]
        curr = [alpha * (i * prev1[0]) - gamma * prev2[0]]
        for d in range(1, dmax + 1):
            curr.append(alpha * (i * prev1[d] + d * prev1[d - 1])
                        - gamma * prev2[d])
        rows.append(curr)
    return xp.stack([xp.stack(r) for r in rows])


def gram_poly_table(n: int, m: int, dmax: int, dtype=np.float64) -> np.ndarray:
    """Host-side Gram table over the window: shape (m+1, dmax+1, 2n+1),
    evaluated at integer points i = -n..n."""
    pts = np.arange(-n, n + 1, dtype=np.float64)
    tab = _gram_table(pts, n, m, dmax, np)
    return tab.astype(dtype)


def _weights_from_table(G, factors, n: int, d: int, xp):
    """Combine a Gram table into (center, edge) weight arrays.

    Targets: t = 0 for the center stencil
    (/root/reference/src/savgolFilter.c:368-378) and t = n - e for edge row e
    (/root/reference/src/savgolFilter.c:394-409). Point t maps to table
    column t + n.
    """
    # G: (m+1, d+1, 2n+1); value basis F_k^{(0)}(i) over the window:
    basis = G[:, 0, :]                       # (m+1, 2n+1)
    # F_k^{(d)}(t) at targets t = 0 and t = n-e  (columns n and 2n-e):
    center_t = G[:, d, n]                    # (m+1,)
    # On-device (jnp) einsums must pin HIGHEST precision — TPU would
    # otherwise run them in bf16 and corrupt the weights themselves.
    kw = {} if xp is np else {"precision": jax.lax.Precision.HIGHEST}
    center = xp.einsum("k,ki->i", factors * center_t, basis, **kw)
    edge_cols = G[:, d, :][:, ::-1][:, : n]  # columns 2n, 2n-1, ..., n+1
    # edge_cols[k, e] = F_k^{(d)}(n - e)
    edge = xp.einsum("ke,ki->ei", factors[:, None] * edge_cols, basis, **kw)
    return center, edge


def savgol_weights_np(config: SavgolConfig, dtype=np.float32):
    """Reference-parity weights on the host in full f64, cast at the end.

    Returns ``(center, edge)`` with shapes ``(2n+1,)`` and ``(n, 2n+1)``.
    ``center[idx]`` weights input point i = idx - n; ``edge[e]`` is the row
    used for output position e (leading, data reversed) and position
    N-1-e (trailing, data forward) — see src/savgolFilter.c:769-784.
    """
    n, m, d = config.half_window, config.poly_order, config.derivative
    G = gram_poly_table(n, m, d)
    factors = _norm_factors(n, m)
    center, edge = _weights_from_table(G, factors, n, d, np)
    return center.astype(dtype), edge.astype(dtype)


@functools.partial(jax.jit, static_argnames=("half_window", "poly_order",
                                             "derivative", "dtype"))
def savgol_weights(half_window: int, poly_order: int, derivative: int = 0,
                   dtype=jnp.float32):
    """On-device, jittable weight generation (same math as the host path).

    All shapes are static functions of the (static) config, so this fuses
    into a single small XLA computation; useful for fused
    weight-gen + convolution pipelines and parameter sweeps where weights
    are (re)generated on device instead of transferred from host.
    """
    n, m, d = half_window, poly_order, derivative
    pts = jnp.arange(-n, n + 1, dtype=dtype)
    G = _gram_table(pts, n, m, d, jnp)
    factors = jnp.asarray(_norm_factors(n, m), dtype=dtype)
    return _weights_from_table(G, factors, n, d, jnp)


def savgol_all_weights_np(config: SavgolConfig, dtype=np.float32):
    """Stacked (n+1, 2n+1) weight matrix: row 0 = center, rows 1..n = edges.

    Convenient for fused edge matmuls."""
    c, e = savgol_weights_np(config, dtype)
    return np.concatenate([c[None, :], e], axis=0)


def savgol_all_weights(half_window: int, poly_order: int, derivative: int = 0,
                       dtype=jnp.float32):
    c, e = savgol_weights(half_window, poly_order, derivative, dtype)
    return jnp.concatenate([c[None, :], e], axis=0)


# ---------------------------------------------------------------------------
# 2D weights: design matrix + normal equations
# (/root/reference/src/savgol2d.c:57-265)
# ---------------------------------------------------------------------------


def monomial_index(i: int, j: int) -> int:
    """Index of x^i y^j in the degree-major monomial ordering
    (1; x, y; x^2, xy, y^2; ...) — /root/reference/src/savgol2d.c:57-65."""
    total = i + j
    return total * (total + 1) // 2 + j


def _design_matrix_np(nx: int, ny: int, order: int) -> np.ndarray:
    """Design matrix A: rows = window points (y-major, x fastest), columns =
    monomials x^i y^j with i+j <= order, f64.
    (/root/reference/src/savgol2d.c:77-105)."""
    xs = np.arange(-nx, nx + 1, dtype=np.float64)
    ys = np.arange(-ny, ny + 1, dtype=np.float64)
    X, Y = np.meshgrid(xs, ys)               # (H, W), y-major rows
    x = X.ravel()
    y = Y.ravel()
    nterms = (order + 1) * (order + 2) // 2
    A = np.empty((x.size, nterms), dtype=np.float64)
    for tot in range(order + 1):
        for j in range(tot + 1):
            i = tot - j
            A[:, monomial_index(i, j)] = x**i * y**j
    return A


def savgol2d_weights_np(config: Savgol2DConfig, dtype=np.float32) -> np.ndarray:
    """2D convolution weights, shape (window_height, window_width).

    weights = A @ (A^T A)^{-1} e_k * dx! * dy!, i.e. the row of pinv(A)
    selecting the coefficient of monomial x^dx y^dy, scaled so that the
    polynomial coefficient becomes the derivative value
    (/root/reference/src/savgol2d.c:188-265). Solved in f64 via Cholesky
    (the normal matrix is SPD for valid configs), cast to ``dtype``.
    """
    nx, ny = config.half_window_x, config.half_window_y
    order = config.poly_order
    dx, dy = config.deriv_x, config.deriv_y
    A = _design_matrix_np(nx, ny, order)
    k = monomial_index(dx, dy)
    # Degenerate window geometries make monomial columns coincide on the
    # grid (e.g. half_window_y=1 with order 3: y^3 == y on {-1,0,1}), so
    # the polynomial FIT is ambiguous — but the weights w = A c are
    # invariant across the solution family of a CONSISTENT singular
    # system (two solutions differ by a null vector of A, which A
    # annihilates), so the FILTER is still well-defined whenever e_k is
    # orthogonal to the null space, i.e. the requested coefficient does
    # not mix into the ambiguity (e.g. half_window_x=1 order 3 target
    # x*y^2: only x vs x^3 are ambiguous). Those configs solve via the
    # truncated pseudo-inverse (min-norm, deterministic — no Cholesky
    # pivot luck). Only when the target coefficient itself lies in the
    # null space (d/dy with y^3 == y: c_y vs c_{y^3} indistinguishable)
    # is the functional ill-posed — reject. Neither a Cholesky failure
    # nor an unnormalized solve residual detects that case reliably:
    # LAPACK can factor the singular normal matrix by rounding luck and
    # the huge column scales hide the residual (observed: (8,1,order 3,
    # dy=1) returned d/dy weights off by 10x with residual 4e-14). All
    # decisions use the column-normalized design (scale-invariant;
    # measured gap: full-rank geometries have sigma_min/sigma_max
    # >= 4.5e-3, degenerate ones <= 2e-16).
    norms = np.linalg.norm(A, axis=0)
    s, Vt = np.linalg.svd(A / norms, compute_uv=True)[1:]
    deficient = s <= 1e-8 * s[0]
    if deficient.any():
        if np.linalg.norm(Vt[deficient][:, k]) > 1e-6:
            raise np.linalg.LinAlgError(
                f"ill-posed 2D window: the coefficient of "
                f"x^{dx} y^{dy} is not identifiable at order {order} on a "
                f"{config.window_height}x{config.window_width} grid "
                "(coincident monomial columns include the target); "
                "increase the half-windows or lower poly_order")
        keep = ~deficient
        e_n = np.zeros(A.shape[1], dtype=np.float64)
        e_n[k] = 1.0 / norms[k]
        # min-norm b solving (An^T An) b = e/D_k, then c = D^{-1} b
        b = Vt[keep].T @ ((Vt[keep] @ e_n) / s[keep] ** 2)
        c = b / norms
    else:
        ata = A.T @ A
        e = np.zeros(A.shape[1], dtype=np.float64)
        e[k] = 1.0
        try:
            L = np.linalg.cholesky(ata)
            c = np.linalg.solve(L.T, np.linalg.solve(L, e))
        except np.linalg.LinAlgError as err:
            raise np.linalg.LinAlgError(
                f"2D normal matrix not factorable in f64 for order {order} "
                f"on a {config.window_height}x{config.window_width} grid"
            ) from err
    scale = math.factorial(dx) * math.factorial(dy)
    w = (A @ c) * scale
    return w.reshape(config.window_height, config.window_width).astype(dtype)


def _check_design_rank(A: np.ndarray, wh: int, ww: int, order: int) -> None:
    """Reject rank-deficient monomial bases on the ON-DEVICE path (its
    Cholesky cannot take the min-norm pseudo-inverse route the host
    generator uses for rank-deficient-but-well-posed targets)."""
    An = A / np.linalg.norm(A, axis=0, keepdims=True)
    s = np.linalg.svd(An, compute_uv=False)
    if s[-1] <= 1e-8 * s[0]:
        raise np.linalg.LinAlgError(
            f"degenerate 2D window for the on-device generator: the "
            f"order-{order} monomial basis is rank-deficient on a "
            f"{wh}x{ww} grid (coincident monomial columns); increase the "
            "half-windows or lower poly_order — well-posed derivative "
            "targets on such grids are served by the host generator "
            "savgol2d_weights_np")


@functools.lru_cache(maxsize=None)
def _validate_2d_geometry(nx: int, ny: int, order: int,
                          np_dtype=np.float32) -> None:
    """Trace-time degeneracy check for the on-device generator.

    Whether the device Cholesky can factor the normal matrix is a function
    of the STATIC geometry (nx, ny, order) and working dtype only, so the
    check runs once at trace time; without it, ``cho_solve`` on a singular
    system silently returns NaN weights on device. Rejects (a) geometries
    with coincident monomial columns (rank-deficient — e.g. half_window_y=1
    with order 3, where y^3 == y on {-1,0,1}; the reference also refuses
    these, src/savgol2d.c:144-148) and (b) systems whose working-dtype
    factorization fails even though f64 LAPACK would cope — for those, use
    the host generator ``savgol2d_weights_np``."""
    A = _design_matrix_np(nx, ny, order)
    # scale-invariant rank test (raw matrix_rank on the huge-entry normal
    # matrix falsely rejects valid large configs, e.g. (16,16,order 6),
    # whose f64 solve is exact) ...
    _check_design_rank(A, 2 * ny + 1, 2 * nx + 1, order)
    # ... then predict working-dtype factorability of the actual system
    try:
        np.linalg.cholesky((A.T @ A).astype(np_dtype))
    except np.linalg.LinAlgError:
        raise np.linalg.LinAlgError(
            f"2D window not factorable in the working dtype for the "
            f"on-device generator: order-{order} normal matrix on a "
            f"{2 * ny + 1}x{2 * nx + 1} grid; use a wider dtype or the "
            "host generator savgol2d_weights_np")


@functools.partial(jax.jit, static_argnames=(
    "half_window_x", "half_window_y", "poly_order", "deriv_x", "deriv_y",
    "dtype"))
def savgol2d_weights(half_window_x: int, half_window_y: int, poly_order: int,
                     deriv_x: int = 0, deriv_y: int = 0, dtype=jnp.float32):
    """On-device 2D weight generation (jittable).

    Same normal-equations construction as the host path, in the working
    dtype, solved with a Cholesky factorization on device. Degenerate
    window geometries raise ``numpy.linalg.LinAlgError`` at trace time
    (the singularity is knowable from the static args alone).
    """
    nx, ny, order = half_window_x, half_window_y, poly_order
    np_dtype = np.float64 if jnp.dtype(dtype).itemsize >= 8 else np.float32
    _validate_2d_geometry(nx, ny, order, np_dtype)
    hp = jax.lax.Precision.HIGHEST
    A = jnp.asarray(_design_matrix_np(nx, ny, order), dtype=dtype)
    ata = jnp.matmul(A.T, A, precision=hp)
    e = jnp.zeros((A.shape[1],), dtype=dtype).at[
        monomial_index(deriv_x, deriv_y)].set(1.0)
    c = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(ata), e)
    scale = float(math.factorial(deriv_x) * math.factorial(deriv_y))
    w = jnp.matmul(A, c, precision=hp) * scale
    return w.reshape(2 * ny + 1, 2 * nx + 1)
