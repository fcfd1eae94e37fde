"""Batched small least-squares solvers, TPU-first.

The masked / nonuniform paths solve one tall-skinny LS problem
``min_c ||A c - b||`` per output position, with A of shape (window, m+1),
batched over millions of positions. ``jnp.linalg.qr`` (blocked
Householder) is the accuracy gold standard but MXU-hostile at these
shapes — XLA lowers it to long sequences of small ops. Shifted
CholeskyQR3 [Fukaya, Kannan, Nakatsukasa, Yamamoto, Yanagisawa, 2020,
"Shifted Cholesky QR for computing the QR factorization of
ill-conditioned matrices"] reaches Householder's forward-error class for
cond(A) up to ~eps^{-1} (f32: ~1.7e7 — covering even exactly-determined
hole-starved windows, measured cond ~1e5) using ONLY matmuls and tiny
triangular solves:

    G1 = A^T A ;  s = 11(ws*k + k(k+1)) eps tr(G1)   (safe PD shift)
    L1 = chol(G1 + s I) ;  B = A L1^{-T}      (shifted orthogonalizer)
    L2 = chol(B^T B)    ;  C = B L2^{-T}      (CholeskyQR pass 2)
    L3 = chol(C^T C)    ;  Q = C L3^{-T}      (CholeskyQR pass 3)
    R  = L3^T L2^T L1^T ;  QR = A exactly (shift cancels in the product)
    c  = R^{-1} Q^T b back-substituted through the three factors.

Each Gram is formed from the ACTUAL rounded previous factor — that
refresh is what upgrades plain CholeskyQR's cond^2 error to QR-class.
Plain (unshifted) CholeskyQR2 was measured breaking down (NaN via a
non-PD Gram) on >50% of exactly-determined quartic windows; the shift
makes the first Cholesky unconditionally safe and the extra pass
restores orthogonality. A worst-case harness vs f64 lstsq shows
max-error parity with Householder at nvalid = k .. full window.

Positions whose A was substituted (under-quorum) must arrive as
identity-padded (G = I); anything that still breaks down surfaces as
NaN and is reported via the returned finite-mask so callers can route
those positions to ``fill``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

__all__ = ["cholqr_lstsq", "cholesky_solve_planes",
           "cholesky_solve_planes_dd", "sliding_windows"]


# ---------------------------------------------------------------------------
# double-word ("double-float") arithmetic on plane pairs
# ---------------------------------------------------------------------------
# TPU has no f64; the accuracy-critical masked solves emulate ~2x working
# precision with (hi, lo) float pairs [Dekker 1971; Hida/Li/Bailey QD] —
# pure elementwise ops that XLA fuses over the position planes. eps_dd is
# ~2^-48 for f32 pairs, ~2^-106 for f64 pairs.


def _split_const(dtype):
    return float(2 ** 27 + 1) if dtype == jnp.float64 else float(2 ** 12 + 1)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b, c):
    p = a * b
    ac = a * c
    ahi = ac - (ac - a)
    alo = a - ahi
    bc = b * c
    bhi = bc - (bc - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _dd_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _quick_two_sum(s, e)


def _dd_sub(x, y):
    return _dd_add(x, (-y[0], -y[1]))


def _dd_mul(x, y, c):
    p, e = _two_prod(x[0], y[0], c)
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def _dd_div(x, y, c):
    q1 = x[0] / y[0]
    r = _dd_sub(x, _dd_mul((q1, jnp.zeros_like(q1)), y, c))
    q2 = r[0] / y[0]
    r = _dd_sub(r, _dd_mul((q2, jnp.zeros_like(q2)), y, c))
    q3 = r[0] / y[0]
    s, e = _quick_two_sum(q1, q2)
    return _quick_two_sum(s, e + q3)


def _dd_sqrt(x, c):
    t = jnp.sqrt(x[0])
    p, e = _two_prod(t, t, c)
    d = (((x[0] - p) - e) + x[1]) / (2.0 * t)
    return _quick_two_sum(t, d)


def sliding_windows(a: jax.Array, window: int) -> jax.Array:
    """(..., N + window - 1) -> (..., N, window) sliding windows.

    Built from ``window`` shifted slices + stack (pure contiguous data
    movement XLA vectorizes) instead of a gather on the minor axis,
    which TPUs serialize. ``window`` must be static.
    """
    n_out = a.shape[-1] - window + 1
    return jnp.stack([lax.slice_in_dim(a, j, j + n_out, axis=-1)
                      for j in range(window)], axis=-1)


def cholesky_solve_planes(gram: jax.Array, pair_index, rhs: jax.Array,
                          quorum: jax.Array, rcond: float | None = None):
    """Batched SPD solve ``G c = r`` from Gram ENTRY PLANES.

    The masked normal-equation paths have one tiny k x k Gram per output
    position. Materializing them as a (..., positions, k, k) tensor is a
    TPU layout disaster: the minor (k, k) dims are tile-padded to
    (8·ceil(k/8), 128) — 41x memory blowup at k = 5, measured as a 34 GB
    HBM allocation (f32[64,131072,5,5] -> T(8,128)) for a 0.8 GB logical
    tensor. Instead this solver keeps every Gram ENTRY as its own
    (..., positions) PLANE — the layout the bank correlations already
    produce — and runs an unrolled k x k Cholesky factorization +
    substitution as pure elementwise ops over the position axes, which
    XLA fuses into a single VPU pass with zero padded dims.

    gram: (Kp, ...) stack of the k(k+1)/2 unique Gram entries;
    pair_index: (k, k) host int array mapping (i, j) -> plane index;
    rhs: (k, ...); quorum: (...) bool — under-quorum positions are
    solved against the identity (coef = rhs there; callers mask with
    ``fill``). With ``rcond``, positions whose Cholesky diagonal
    collapses below ``sqrt(rcond) * max|diag|`` (or went non-finite)
    are ALSO identity-substituted and reported not-ok — the per-position
    identifiability rule of the masked 2D path.

    Returns ``(coef, ok)``: (k, ...) solutions and the (...) bool of
    positions that are quorate (and identifiable, when rcond is given).
    """
    import numpy as np
    pi = np.asarray(pair_index)
    k = pi.shape[0]
    dtype = gram.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def g(i, j):
        return jnp.where(quorum, gram[pi[i, j]], one if i == j else zero)

    # Unrolled left-looking Cholesky on planes. Quorate windows beyond
    # cond(G) ~ 1/eps make the UNSHIFTED factorization non-finite (a
    # pivoted LU would return finite garbage there); factoring twice —
    # plain and with the sCholQR shift ~k^2 * eps * tr(G) — and selecting
    # per position keeps the plain factor (whose refinement converges to
    # the exact stored-(G, b) solution) wherever it is finite, and the
    # shifted finite-garbage of LU's error class only where nothing in
    # working precision can factor G. Both passes are fused elementwise
    # plane ops; the second costs ~k^3/3 extra FMAs per position.
    eps = float(jnp.finfo(dtype).eps)
    tr = gram[pi[0, 0]]
    for j in range(1, k):
        tr = tr + gram[pi[j, j]]
    shift = jnp.where(quorum,
                      (2.0 * k * (k + 1) * eps) * jnp.abs(tr), zero)

    def factor(use_shift):
        L = [[None] * k for _ in range(k)]
        dinv = [None] * k
        for j in range(k):
            s = g(j, j) + (shift if use_shift else zero)
            for p in range(j):
                s = s - L[j][p] * L[j][p]
            L[j][j] = jnp.sqrt(s)
            dinv[j] = one / L[j][j]
            for i in range(j + 1, k):
                s = g(i, j)
                for p in range(j):
                    s = s - L[i][p] * L[j][p]
                L[i][j] = s * dinv[j]
        return L, dinv

    L0, dinv0 = factor(False)
    L1, dinv1 = factor(True)
    finite0 = jnp.isfinite(jnp.stack([dinv0[j] for j in range(k)])
                           ).all(axis=0)
    L = [[None] * k for _ in range(k)]
    dinv = [None] * k
    for j in range(k):
        dinv[j] = jnp.where(finite0, dinv0[j], dinv1[j])
        for i in range(j, k):
            L[i][j] = jnp.where(finite0, L0[i][j], L1[i][j])

    if rcond is not None:
        diag = jnp.stack([L[j][j] for j in range(k)])
        dmax = jnp.max(jnp.abs(diag), axis=0)
        import math as _math
        ok = (quorum & jnp.isfinite(diag).all(axis=0)
              & (jnp.min(diag, axis=0)
                 > _math.sqrt(rcond) * jnp.maximum(dmax, 1e-30)))
        for j in range(k):
            for i in range(j + 1, k):
                L[i][j] = jnp.where(ok, L[i][j], zero)
            dinv[j] = jnp.where(ok, dinv[j], one)
    else:
        ok = quorum

    def solve(r):
        # forward substitution L z = r, then back substitution L^T c = z
        z = [None] * k
        for i in range(k):
            s = r[i]
            for j in range(i):
                s = s - L[i][j] * z[j]
            z[i] = s * dinv[i]
        c = [None] * k
        for i in reversed(range(k)):
            s = z[i]
            for j in range(i + 1, k):
                s = s - L[j][i] * c[j]
            c[i] = s * dinv[i]
        return c

    c = solve(rhs)
    # One step of iterative refinement with a COMPENSATED residual
    # (TwoProd/TwoSum error-free transforms): converges to the exact
    # solution of the stored (G, b) even on hole-starved Grams at
    # cond ~ 1/eps, where a plain-precision residual is pure
    # cancellation noise (|G||c| eps swamps the true residual). All
    # elementwise, XLA-fuses with the factorization.
    split_c = float(2 ** 27 + 1) if dtype == jnp.float64 else float(2 ** 12 + 1)

    def two_prod(a, b):
        p = a * b
        ac = a * split_c
        ahi = ac - (ac - a)
        alo = a - ahi
        bc = b * split_c
        bhi = bc - (bc - b)
        blo = b - bhi
        e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
        return p, e

    def two_sum(a, b):
        s = a + b
        bb = s - a
        e = (a - (s - bb)) + (b - bb)
        return s, e

    res = []
    for i in range(k):
        s, comp = rhs[i], zero
        for j in range(k):
            p, pe = two_prod(g(i, j), -c[j])
            s, se = two_sum(s, p)
            comp = comp + (pe + se)
        res.append(s + comp)
    dc = solve(res)
    return jnp.stack([ci + di for ci, di in zip(c, dc)]), ok


def correlate_valid_dd(x: jax.Array, w64) -> tuple[jax.Array, jax.Array]:
    """K-stencil valid correlation with double-word accumulation.

    ``x``: (..., Npad) exact working-precision data; ``w64``: host (K, ws)
    float64 stencils, split tap-wise into (hi, lo) working-precision
    pairs so each tap product and the tap sum carry ~eps^2 error. Feeds
    :func:`cholesky_solve_planes_dd` the Gram/rhs planes whose formation
    error would otherwise dominate the masked normal equations
    (cond(A)^2 * ws * eps). Everything is shifted slices + elementwise
    EFT ops; XLA fuses the whole bank into one pass over the planes.

    Returns ``(hi, lo)`` of shape (K, ..., Npad - ws + 1).
    """
    import numpy as np
    w64 = np.asarray(w64, dtype=np.float64)
    K, ws = w64.shape
    np_work = np.float64 if x.dtype == jnp.float64 else np.float32
    w_hi = w64.astype(np_work)
    w_lo = (w64 - w_hi).astype(np_work)
    c = _split_const(x.dtype)
    n_out = x.shape[-1] - ws + 1
    his, los = [], []
    for k in range(K):
        acc = None
        for t in range(ws):
            if w_hi[k, t] == 0.0 and w_lo[k, t] == 0.0:
                continue
            xt = lax.slice_in_dim(x, t, t + n_out, axis=-1)
            p, e = _two_prod(jnp.asarray(w_hi[k, t], x.dtype), xt, c)
            e = e + jnp.asarray(w_lo[k, t], x.dtype) * xt
            acc = (p, e) if acc is None else _dd_add(acc, (p, e))
        if acc is None:
            z = jnp.zeros(x.shape[:-1] + (n_out,), x.dtype)
            acc = (z, z)
        his.append(acc[0])
        los.append(acc[1])
    return jnp.stack(his), jnp.stack(los)


def cholesky_solve_planes_dd(gram_hi, gram_lo, pair_index, rhs_hi, rhs_lo,
                             quorum, rcond: float | None = None):
    """Double-word plane Cholesky: ``G c = r`` with (hi, lo) Gram/rhs.

    The TPU-native answer to the masked paths' ``solver="qr"`` accuracy
    contract: with the Gram/rhs formed to ~eps^2 (compensated
    correlations) and the factorization + substitutions carried in
    double-word arithmetic, the solution error is ~cond(G) * eps_dd —
    BELOW Householder QR's cond(A) * eps in working precision for every
    cond(A) up to ~1/eps, without ever materializing a (..., ws, k)
    design tensor (TPU tile-padding punishes those minor dims ~30x, and
    batched tiny QR ran at 0.001 Gs/s measured). Everything here is
    elementwise over the position planes; XLA fuses it into one pass.

    Same contract as :func:`cholesky_solve_planes` otherwise. Returns
    ``(coef, ok)`` with coef in working precision (hi word).
    """
    import numpy as np
    pi = np.asarray(pair_index)
    k = pi.shape[0]
    dtype = gram_hi.dtype
    c = _split_const(dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def g(i, j):
        hi = jnp.where(quorum, gram_hi[pi[i, j]], one if i == j else zero)
        lo = jnp.where(quorum, gram_lo[pi[i, j]], zero)
        return hi, lo

    L = [[None] * k for _ in range(k)]
    dinv = [None] * k
    for j in range(k):
        s = g(j, j)
        for p in range(j):
            s = _dd_sub(s, _dd_mul(L[j][p], L[j][p], c))
        L[j][j] = _dd_sqrt(s, c)
        dinv[j] = _dd_div((one, zero), L[j][j], c)
        for i in range(j + 1, k):
            s = g(i, j)
            for p in range(j):
                s = _dd_sub(s, _dd_mul(L[i][p], L[j][p], c))
            L[i][j] = _dd_mul(s, dinv[j], c)

    diag = jnp.stack([L[j][j][0] for j in range(k)])
    if rcond is not None:
        import math as _math
        dmax = jnp.max(jnp.abs(diag), axis=0)
        ok = (quorum & jnp.isfinite(diag).all(axis=0)
              & (jnp.min(diag, axis=0)
                 > _math.sqrt(rcond) * jnp.maximum(dmax, 1e-30)))
    else:
        ok = quorum & jnp.isfinite(diag).all(axis=0)
    for j in range(k):
        for i in range(j + 1, k):
            L[i][j] = tuple(jnp.where(ok, w, zero) for w in L[i][j])
        dinv[j] = (jnp.where(ok, dinv[j][0], one),
                   jnp.where(ok, dinv[j][1], zero))

    z = [None] * k
    for i in range(k):
        s = (rhs_hi[i], rhs_lo[i])
        for j in range(i):
            s = _dd_sub(s, _dd_mul(L[i][j], z[j], c))
        z[i] = _dd_mul(s, dinv[i], c)
    co = [None] * k
    for i in reversed(range(k)):
        s = z[i]
        for j in range(i + 1, k):
            s = _dd_sub(s, _dd_mul(L[j][i], co[j], c))
        co[i] = _dd_mul(s, dinv[i], c)
    return jnp.stack([ci[0] + ci[1] for ci in co]), ok


def cholqr_lstsq(A: jax.Array, b: jax.Array, *,
                 precision=lax.Precision.HIGHEST):
    """Solve batched LS ``min_c ||A c - b||_2`` by shifted CholeskyQR3.

    A: (..., ws, k) tall-skinny designs (ws >= k, possibly very
       ill-conditioned, or identity-substituted); b: (..., ws).
    Returns ``(coef, rdiag, finite)``: the (..., k) solutions, the
    (..., k) absolute diagonal of the implicit R factor (for
    identifiability tests — diag(R) = diag(L3)*diag(L2)*diag(L1)), and
    a (...,) bool marking positions whose factorization stayed finite.
    """
    ws, k = A.shape[-2:]
    eps = jnp.finfo(A.dtype).eps
    eye = jnp.eye(k, dtype=A.dtype)

    At = jnp.swapaxes(A, -1, -2)                          # (..., k, ws)
    G1 = jnp.matmul(At, A, precision=precision)           # (..., k, k)
    # tr(G1) = ||A||_F^2 >= ||A||_2^2: a slightly larger (still safe)
    # shift than the paper's spectral-norm estimate
    tr = jnp.trace(G1, axis1=-2, axis2=-1)[..., None, None]
    s = (11.0 * (ws * k + k * (k + 1))) * eps * tr
    L1 = jnp.linalg.cholesky(G1 + s * eye)                # R1 = L1^T
    Bt = solve_triangular(L1, At, lower=True)             # (A L1^-T)^T
    G2 = jnp.matmul(Bt, jnp.swapaxes(Bt, -1, -2), precision=precision)
    L2 = jnp.linalg.cholesky(G2)
    Ct = solve_triangular(L2, Bt, lower=True)             # (B L2^-T)^T
    G3 = jnp.matmul(Ct, jnp.swapaxes(Ct, -1, -2), precision=precision)
    L3 = jnp.linalg.cholesky(G3)
    z = jnp.matmul(Ct, b[..., None], precision=precision)  # C^T b
    z = solve_triangular(L3, z, lower=True)               # Q^T b
    y = solve_triangular(jnp.swapaxes(L3, -1, -2), z, lower=False)
    y = solve_triangular(jnp.swapaxes(L2, -1, -2), y, lower=False)
    coef = solve_triangular(jnp.swapaxes(L1, -1, -2), y,
                            lower=False)[..., 0]          # (..., k)
    d1 = jnp.diagonal(L1, axis1=-2, axis2=-1)
    d2 = jnp.diagonal(L2, axis1=-2, axis2=-1)
    d3 = jnp.diagonal(L3, axis1=-2, axis2=-1)
    rdiag = jnp.abs(d1 * d2 * d3)
    finite = (jnp.isfinite(d1).all(axis=-1)
              & jnp.isfinite(d2).all(axis=-1)
              & jnp.isfinite(d3).all(axis=-1))
    return coef, rdiag, finite
