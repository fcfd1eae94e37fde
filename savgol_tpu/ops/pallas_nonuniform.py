"""Fully-fused non-uniform Savitzky-Golay kernel for TPU.

The staged nonuniform pipeline (ops/nonuniform.py::_fit_taps) is an "XLA
soup next to a fast solve" (ROADMAP round-4): the double-word moment
accumulation — ws taps x (2m+1) moments of EFT adds/muls — unrolls into
thousands of elementwise ops, exceeds XLA's fusion budget, and every
(..., N) temporary round-trips HBM; measured 0.104 Gs/s chained on the
8x131k bench config against a 0.507 Gs/s staged-pipeline roofline. This
kernel runs the ENTIRE pipeline per VMEM tile in one pass:

  per (rows, cols) output tile (x, w, t slabs loaded once, + one
  128-lane halo block for the 2n tap shifts):
    s       = max_t |t[p+t] - t[p]| over valid taps   (normalizer)
    S_p     = sum_t w_t (u_t/s)^p   p = 0..2m         (dd Hankel moments)
    r_q     = sum_t w_t x_t (u_t/s)^q  q = 0..m       (dd rhs)
    coef    = double-word plane Cholesky in registers (ops/lsq.py —
              the SAME routine the staged path runs; pure elementwise
              jnp is legal in Pallas)
    y       = coef[d] * d! / s^d, under-quorum / non-identifying -> fill

No moment/rhs plane ever touches HBM: traffic is x + w + t in, y out
(~16 B/sample) and the kernel is VPU-compute-bound on the EFT chains.
Accuracy is the staged path's own (~eps^2 moment formation + dd solve —
below Householder-QR's cond*eps class); the math has ONE home in
ops/lsq.py and ops/nonuniform.py::_fit_taps is the jnp twin.

HARDWARE-ONLY like the other dd kernels: interpret-mode discharge of
the dd op chain scales explosively with k (CLAUDE.md); off-TPU the twin
is the implementation. Gradients: ops/nonuniform.py wraps this with a
custom VJP through the twin (same pattern as ops/masked.py).

Reference behavior spec: none — the C reference (src/savgolFilter.c)
is uniform-grid only; this is a beyond-reference capability whose
contract is defined by ops/nonuniform.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from savgol_tpu.ops.lsq import (_split_const, _two_sum,
                                cholesky_solve_planes_dd)

__all__ = ["savgol_nonuniform_fused_pallas",
           "savgol_nonuniform_planes_pallas",
           "nonuniform_fused_supported"]

_LANES = 128
_SUBLANES = 8
# VMEM budget for the live planes (cached taps + dd moments/rhs + the
# Cholesky factor/substitution workspace). Tile size is the measured
# perf lever: on the n=12/m=4 8x131k bench config the kernel runs 0.076
# / 0.129 / 0.214 Gs/s chained at cols = 1024 / 2048 / 4096 (v5e) — the
# per-block overhead dominates small tiles — so the budget is set to
# pick the largest tile the ~96 MB VMEM limit comfortably holds.
_VMEM_BUDGET = 28 * 1024 * 1024


def _round_up(a, b):
    return -(-a // b) * b


def nonuniform_fused_supported(half_window: int) -> bool:
    """The tap shifts (up to 2n) must fit the single 128-lane halo."""
    return 2 * int(half_window) <= _LANES


def _nonuni_kernel(x_ref, xh_ref, w_ref, wh_ref, t_ref, th_ref, o_ref, *,
                   n: int, m: int, d: int, kmin: int, fill: float,
                   rcond: float, n_total: int, cols: int,
                   emit_planes: bool = False):
    """One (rows, cols) output tile; slabs are (rows, cols + 128)."""
    ci = pl.program_id(1)
    ws = 2 * n + 1
    xw = jnp.concatenate([x_ref[:, :], xh_ref[:, :]], axis=1)
    ww = jnp.concatenate([w_ref[:, :], wh_ref[:, :]], axis=1)
    tw = jnp.concatenate([t_ref[:, :], th_ref[:, :]], axis=1)
    dtype = xw.dtype
    # zero weights past the true padded length: the clamped halo BlockSpec
    # re-reads an earlier block there (arbitrary data) and w = 0 is the
    # correct truncate semantics for synthetic positions
    col = jax.lax.broadcasted_iota(jnp.int32, (1, xw.shape[1]), 1)
    inside = ci * cols + col < n_total
    ww = jnp.where(inside, ww, jnp.zeros((), dtype))

    tc = tw[:, n:n + cols]                       # raw center abscissae

    # pass 1: taps loaded ONCE (they stay live in VMEM/registers for
    # pass 2), normalizer (largest valid |offset|; 1 when all coincide)
    # + quorum count — mirrors ops/nonuniform.py::_fit_taps exactly.
    # Invalid taps carry w = 0 AND u = 0: an unsanitized epoch-scale
    # offset would overflow u^(2m) to inf and poison the moment with
    # inf * 0 = NaN (the jnp twin sanitizes identically).
    taps = []
    s = None
    count = None
    for tt in range(ws):
        w_t = ww[:, tt:tt + cols]
        u_t = jnp.where(w_t > 0, tw[:, tt:tt + cols] - tc,
                        jnp.zeros((), dtype))
        taps.append((w_t, u_t))
        au = jnp.abs(u_t)
        s = au if s is None else jnp.maximum(s, au)
        c_t = (w_t > 0).astype(dtype)
        count = c_t if count is None else count + c_t
    s = jnp.where(s > 0, s, jnp.ones((), dtype))
    sinv = 1.0 / s
    quorum = count >= (kmin - 0.5)

    # pass 2: double-word Hankel moments + rhs. Same EFT mathematics as
    # ops/lsq.py's _dd_mul/_dd_add chain (the jnp twin), restructured
    # for the VPU — this loop is the kernel's entire flop budget
    # (measured ~50% of VPU peak on the generic dd ops), so:
    #   * shared operands are Dekker-SPLIT once per tap / per power
    #     step instead of once per product (w feeds 2m+1 products, wx
    #     m+1, the running power pw three);
    #   * accumulators defer renormalization: exact (hi, err) products
    #     two_sum into the hi word and every residual goes to a plain
    #     error word, renormalized once after the tap loop (error
    #     growth ~ws*eps^2 — far below the formation bound that the
    #     accuracy contract quotes);
    #   * the running power stays renormalized (quick_two_sum) because
    #     it CHAINS through 2m products.
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    n_mom = 2 * m + 1
    csp = _split_const(dtype)

    def split(a):
        t_ = a * csp
        hi = t_ - (t_ - a)
        return hi, a - hi

    Ss = [zero] * n_mom
    Se = [zero] * n_mom
    rs = [zero] * (m + 1)
    re = [zero] * (m + 1)
    for tt in range(ws):
        w_t, u_t = taps[tt]
        x_t = xw[:, tt:tt + cols]
        wx = w_t * x_t          # one working-precision rounding, as twin
        un = u_t * sinv
        unh, unl = split(un)
        wh, wl = split(w_t)
        wxh, wxl = split(wx)
        # p = 0: pw == 1 exactly -> the products ARE w and wx
        Ss[0], e = _two_sum(Ss[0], w_t)
        Se[0] = Se[0] + e
        rs[0], e = _two_sum(rs[0], wx)
        re[0] = re[0] + e
        pw, pwl = un, zero      # un^1, exact
        for p in range(1, n_mom):
            pwh, pwlo = split(pw)
            ph = pw * w_t
            ee = (((pwh * wh - ph) + pwh * wl + pwlo * wh)
                  + pwlo * wl) + pwl * w_t
            Ss[p], e = _two_sum(Ss[p], ph)
            Se[p] = Se[p] + (ee + e)
            if p <= m:
                pr = pw * wx
                ee = (((pwh * wxh - pr) + pwh * wxl + pwlo * wxh)
                      + pwlo * wxl) + pwl * wx
                rs[p], e = _two_sum(rs[p], pr)
                re[p] = re[p] + (ee + e)
            if p + 1 < n_mom:
                pn = pw * un
                ee = (((pwh * unh - pn) + pwh * unl + pwlo * unh)
                      + pwlo * unl) + pwl * un
                # keep the chained power renormalized (|lo| <= ulp(hi))
                pw = pn + ee
                pwl = ee - (pw - pn)
    S = [_two_sum(Ss[p], Se[p]) for p in range(n_mom)]
    r = [_two_sum(rs[q], re[q]) for q in range(m + 1)]

    hankel = np.add.outer(np.arange(m + 1), np.arange(m + 1))
    # rcond acts on the design's singular values; the dd solver gates on
    # diag L ~ their squares' roots — square it going in (as _fit_taps)
    coef, ok = cholesky_solve_planes_dd(
        jnp.stack([h for h, _ in S]), jnp.stack([l for _, l in S]),
        hankel,
        jnp.stack([h for h, _ in r]), jnp.stack([l for _, l in r]),
        quorum, rcond=rcond ** 2)

    if emit_planes:
        # resample mode: the full coefficient/normalizer stack instead
        # of one extracted derivative — rows 0..m the u/s-basis coef
        # planes, m+1 the normalizer s, m+2 the quorum mask as 0/1
        # (d and fill are applied downstream at evaluation time)
        for j in range(m + 1):
            o_ref[j] = coef[j].astype(o_ref.dtype)
        o_ref[m + 1] = s.astype(o_ref.dtype)
        o_ref[m + 2] = jnp.where(ok, one, zero).astype(o_ref.dtype)
        return
    sd = jnp.ones_like(s)
    for _ in range(d):
        sd = sd * s
    y = coef[d] * (float(math.factorial(d)) / sd)
    o_ref[:, :] = jnp.where(ok, y, jnp.asarray(fill, dtype)).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "m", "d", "kmin",
                                             "fill", "rcond", "rows",
                                             "cols", "n_total",
                                             "interpret", "emit_planes"))
def _nonuni_call(xp, wp, tp, n, m, d, kmin, fill, rcond, rows, cols,
                 n_total, interpret, emit_planes=False):
    # fill arrives as repr(float) — a hashable jit key NaN cannot break
    fill = float(fill)
    B, Np = xp.shape
    n_out = Np - _LANES
    last128 = Np // _LANES - 1
    kernel = functools.partial(
        _nonuni_kernel, n=n, m=m, d=d, kmin=kmin, fill=fill,
        rcond=float(rcond), n_total=n_total, cols=cols,
        emit_planes=emit_planes)
    block = pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM)
    halo = pl.BlockSpec(
        (rows, _LANES),
        lambda bi, ci: (bi, jnp.minimum((ci + 1) * (cols // _LANES),
                                        last128)),
        memory_space=pltpu.VMEM)
    if emit_planes:
        out_specs = pl.BlockSpec((m + 3, rows, cols),
                                 lambda bi, ci: (0, bi, ci),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((m + 3, B, n_out), xp.dtype)
    else:
        out_specs = block
        out_shape = jax.ShapeDtypeStruct((B, n_out), xp.dtype)
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=(B // rows, n_out // cols),
        in_specs=[block, halo, block, halo, block, halo],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **params,
    )(xp, xp, wp, wp, tp, tp)


def _pick_tile(n: int, m: int, esize: int):
    """(rows, cols) so the live plane set fits the VMEM budget."""
    k = m + 1
    n_live = (2 * (2 * n + 1)                    # cached (w, u) taps
              + 2 * (2 * m + 1) + 2 * k          # dd moments + rhs
              + 2 * (k * (k + 1) // 2 + 2 * k)   # dd L factor + subst
              + 12)
    rows, cols = _SUBLANES, 32 * _LANES
    while n_live * rows * cols * esize > _VMEM_BUDGET and cols > _LANES:
        cols //= 2
    return rows, cols


def savgol_nonuniform_fused_pallas(xz, wts, traw, *, half_window: int,
                                   poly_order: int, derivative: int,
                                   kmin: int, fill: float, rcond: float,
                                   rows: int | None = None,
                                   cols: int | None = None,
                                   interpret: bool | None = None):
    """Fused nonuniform apply: ``xz``/``wts`` the mask-sanitized values
    and weights, ``traw`` the RAW abscissae (invalid taps are killed by
    w = 0, not by sanitized t), all (..., N) in working dtype. Returns
    the (..., N) d-th derivatives at each sample's own abscissa with
    ``fill`` at under-quorum / non-identifying positions — exactly
    ops/nonuniform.py::_fit_taps' contract (truncate edges)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = int(half_window)
    m = int(poly_order)
    if not nonuniform_fused_supported(n):
        raise ValueError(f"fused nonuniform kernel supports 2n <= {_LANES}"
                         f", got half_window={n}")
    batch_shape = xz.shape[:-1]
    N = xz.shape[-1]
    xb = xz.reshape(-1, N)
    wb = wts.reshape(-1, N)
    tb = traw.reshape(-1, N).astype(xz.dtype)
    B = xb.shape[0]

    r0, c0 = _pick_tile(n, m, xz.dtype.itemsize)
    rows = r0 if rows is None else rows
    cols = c0 if cols is None else cols
    rows = min(rows, _round_up(B, _SUBLANES))
    n_out_p = _round_up(N, cols)
    Np = n_out_p + _LANES
    Bp = _round_up(B, rows)
    pad = ((0, Bp - B), (n, Np - N - n))
    xp = jnp.pad(xb, pad)
    wp = jnp.pad(wb, pad)                        # zero weight = missing
    tp = jnp.pad(tb, pad)
    out = _nonuni_call(xp, wp, tp, n, m, int(derivative), int(kmin),
                       repr(float(fill)), float(rcond), rows, cols,
                       N + 2 * n, interpret)
    return out[:B, :N].reshape(batch_shape + (N,))


def savgol_nonuniform_planes_pallas(xz, wts, traw, *, half_window: int,
                                    poly_order: int, kmin: int,
                                    rcond: float,
                                    interpret: bool | None = None):
    """Fused nonuniform FIT emitting the full plane stack.

    Same tile pipeline as :func:`savgol_nonuniform_fused_pallas` but the
    output is everything ``savgol_resample`` needs to evaluate at
    arbitrary query positions instead of one extracted derivative:
    ``(coef, s, okf)`` with ``coef`` the ``(m+1, ..., N)`` polynomial
    coefficient planes in each window's u/s-normalized basis, ``s`` the
    ``(..., N)`` normalizers and ``okf`` the quorum/identifiability mask
    as 0/1 floats — ops/nonuniform.py::_fit_coeffs' contract (which is
    the jnp twin; gradients flow through it via the custom VJP in
    ops/nonuniform.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = int(half_window)
    m = int(poly_order)
    if not nonuniform_fused_supported(n):
        raise ValueError(f"fused nonuniform kernel supports 2n <= {_LANES}"
                         f", got half_window={n}")
    batch_shape = xz.shape[:-1]
    N = xz.shape[-1]
    xb = xz.reshape(-1, N)
    wb = wts.reshape(-1, N)
    tb = traw.reshape(-1, N).astype(xz.dtype)
    B = xb.shape[0]

    r0, c0 = _pick_tile(n, m, xz.dtype.itemsize)
    rows = min(r0, _round_up(B, _SUBLANES))
    cols = c0
    n_out_p = _round_up(N, cols)
    Np = n_out_p + _LANES
    Bp = _round_up(B, rows)
    pad = ((0, Bp - B), (n, Np - N - n))
    xp = jnp.pad(xb, pad)
    wp = jnp.pad(wb, pad)                        # zero weight = missing
    tp = jnp.pad(tb, pad)
    out = _nonuni_call(xp, wp, tp, n, m, 0, int(kmin), repr(0.0),
                       float(rcond), rows, cols, N + 2 * n, interpret,
                       emit_planes=True)
    out = out[:, :B, :N]
    coef = out[:m + 1].reshape((m + 1,) + batch_shape + (N,))
    s = out[m + 1].reshape(batch_shape + (N,))
    okf = out[m + 2].reshape(batch_shape + (N,))
    return coef, s, okf
