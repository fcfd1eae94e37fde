"""Fully-fused masked 2D Savitzky-Golay kernel (normal solver) for TPU.

The staged masked-2D pipeline (ops/masked.py::savgol2d_apply_masked)
correlates the image with Kp + P dense pair/basis stencils (65 for the
order-3 flagship) through the K-chunked row-banded MXU stack kernel —
wh matmuls per stencil per 128-lane block (~715 six-pass matmuls), with
every Gram/rhs plane round-tripping HBM between the stack launches and
the plane solve. This kernel replaces both the math and the staging:

**Separable tensor-moment Gram.** In a TENSOR-PRODUCT orthonormal basis
B_(i,j)(x, y) = phi_i(x) * psi_j(y) (1D QR bases per axis, i + j <= m),
every Gram pair stencil is separable:

    B_a * B_b = (phi_i phi_k)(x) (x) (psi_j psi_l)(y)

and the 1D products expand EXACTLY in the same 1D bases (grid-function
projection, host f64). So the whole masked Gram is a fixed linear
combination of <= (2m+1)(2m+2)/2 rank-1 "tensor moments"

    T[s, t] = sum_window w * phi_s(x) * psi_t(y)

each of which is ONE vertical VPU slab combination (shared across all s)
followed by ONE banded matmul. Per 128-lane block the flagship costs
~7 slab combinations + 28 + 10 matmuls instead of 715 — the MXU work
drops ~18x — and the combination coefficients are O(1) (products of
orthonormal-basis expansion coefficients), so the reconstructed Gram
stays in the same exact-f32 error class as direct pair correlation.

**One VMEM pass.** Moments, rhs, Gram assembly, quorum, the unrolled
plane Cholesky (ops/lsq.py — the same dual-factor + compensated
refinement routine the staged path runs), derivative extraction and the
fill select all happen per tile; no Gram/rhs plane ever touches HBM.

Gradients: wrapped by ops/masked.py with a custom VJP through the
staged jnp twin (same pattern as the fused 1D kernel).

Behavior spec: /root/reference/src/savgol2d.c:398-456 (apply) +
:188-265 (normal-equation weights); the masked fit generalizes both to
per-pixel valid sets, reproducing them exactly when nothing is missing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from savgol_tpu.ops.lsq import cholesky_solve_planes

__all__ = ["savgol_masked2d_fused_pallas", "tensor_tables_2d",
           "fused2d_supported"]

_LANES = 128
_HALO_R = 32      # shared with pallas_conv's 2D kernels (>= 2 * max hw 16)


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _ortho_1d(w: int, dmax: int):
    """Orthonormal degree-graded 1D polynomial basis on the centered grid
    t = (arange(w) - n) / n, as (Phi (w, dmax+1), Rinv (dmax+1, dmax+1))
    with positive leading coefficients (host f64). Same construction as
    ops/masked.py::_masked_tables, per axis."""
    n = (w - 1) // 2
    t = (np.arange(w, dtype=np.float64) - n) / max(n, 1)
    V = np.vander(t, dmax + 1, increasing=True)
    Q, R = np.linalg.qr(V)
    s = np.sign(np.diag(R)).copy()
    s[s == 0] = 1.0
    Q = Q * s
    R = R * s[:, None]
    Rinv = np.linalg.solve(R, np.eye(dmax + 1))
    return Q, Rinv


def fused2d_supported(half_window_x: int, half_window_y: int,
                      poly_order: int) -> bool:
    """The tensor basis needs per-axis degree ``poly_order`` to be
    representable: m <= 2 * half_window per axis. (Joint-QR configs that
    trade x-degree against y-degree inside a skinny window stay on the
    staged path.)"""
    return (poly_order <= 2 * half_window_x
            and poly_order <= 2 * half_window_y)


@functools.lru_cache(maxsize=None)
def tensor_tables_2d(half_window_x: int, half_window_y: int,
                     poly_order: int):
    """Host f64 tables for the tensor-moment masked 2D fit.

    Returns a dict with:
      PhiX (wx, Sx), PhiY (wy, Sy): per-axis orthonormal bases up to
          degree min(2m, w-1) — moment profiles; columns <= m are the
          fit-basis profiles.
      RinvX, RinvY: monomial coefficients of the basis columns.
      basis: list of (i, j) per fit-basis function, i + j <= m.
      pair_index (P, P): symmetric map into the Kp gram-plane axis.
      moments: list of (s, t) tensor-moment indices actually used.
      comb (Kp, M): gram[k] = sum_mi comb[k, mi] * T[moments[mi]].
      idx00: moment index of (0, 0) (count = T00 * sqrt(wx*wy)).
    """
    nx, ny, m = int(half_window_x), int(half_window_y), int(poly_order)
    wx, wy = 2 * nx + 1, 2 * ny + 1
    dmx, dmy = min(2 * m, wx - 1), min(2 * m, wy - 1)
    if m > dmx or m > dmy:
        raise ValueError(
            f"tensor basis needs poly_order <= 2*half_window per axis "
            f"(got m={m}, windows {wx}x{wy})")
    PhiX, RinvX = _ortho_1d(wx, dmx)
    PhiY, RinvY = _ortho_1d(wy, dmy)

    basis = [(i, t - i) for t in range(m + 1) for i in range(t + 1)]
    P = len(basis)
    pair_index = np.zeros((P, P), dtype=np.int32)
    kp = 0
    pairs = []
    for a in range(P):
        for b in range(a, P):
            pair_index[a, b] = pair_index[b, a] = kp
            pairs.append((a, b))
            kp += 1
    Kp = len(pairs)

    # exact grid-function expansions of the 1D basis products: products of
    # degree <= 2m lie in span(Phi) because Phi spans grid polynomials up
    # to degree min(2m, w-1) and on a w-point grid degree w-1 is everything
    gxx = np.einsum("ws,wi,wk->sik", PhiX, PhiX[:, :m + 1], PhiX[:, :m + 1])
    gyy = np.einsum("wt,wj,wl->tjl", PhiY, PhiY[:, :m + 1], PhiY[:, :m + 1])

    comb_full = np.zeros((Kp, dmx + 1, dmy + 1))
    for k, (a, b) in enumerate(pairs):
        i, j = basis[a]
        kx, ly = basis[b]
        comb_full[k] = np.outer(gxx[:, i, kx], gyy[:, j, ly])
    # keep only moments some gram entry (or the count) actually reads
    used = np.abs(comb_full).max(axis=0) > 1e-13
    used[0, 0] = True
    moments = [(s, t) for s in range(dmx + 1) for t in range(dmy + 1)
               if used[s, t]]
    comb = np.stack([comb_full[:, s, t] for (s, t) in moments], axis=1)
    idx00 = moments.index((0, 0))
    return dict(PhiX=PhiX, PhiY=PhiY, RinvX=RinvX, RinvY=RinvY,
                basis=basis, pair_index=pair_index, moments=moments,
                comb=comb, idx00=idx00)


def _extract_row(tables, deriv_x, deriv_y, delta_x, delta_y,
                 half_window_x, half_window_y):
    """(P,) f64 derivative-extraction row: for basis (i, j) the fitted
    surface's (dx, dy) mixed partial at the window center is
    dx! RinvX[dx, i] * dy! RinvY[dy, j] / (nx dx_step)^dx / (ny dy_step)^dy
    (same scale convention as the staged path / reference
    src/savgol2d.c:249-255)."""
    dx, dy = int(deriv_x), int(deriv_y)
    sx = math.factorial(dx) / float(half_window_x * delta_x) ** dx
    sy = math.factorial(dy) / float(half_window_y * delta_y) ** dy
    return np.asarray([tables["RinvX"][dx, i] * tables["RinvY"][dy, j]
                       for (i, j) in tables["basis"]]) * (sx * sy)


class _TKey:
    """Hashable wrapper keying the kernel cache on concrete table bytes."""

    __slots__ = ("payload", "_k")

    def __init__(self, *arrays):
        self.payload = tuple(np.asarray(a, dtype=np.float64)
                             for a in arrays)
        self._k = tuple((a.shape, a.tobytes()) for a in self.payload)

    def __hash__(self):
        return hash(self._k)

    def __eq__(self, other):
        return isinstance(other, _TKey) and other._k == self._k


@functools.lru_cache(maxsize=128)
def _masked2d_const_call(cfg_key, tkey: _TKey, rows: int, cols: int,
                         wh: int, weighted: bool, kmin: int,
                         fill_repr: str, rcond: float, interpret: bool):
    """Build (and cache) the fused kernel for one concrete config.

    ``tkey`` wraps (PhiY used as vertical profiles, comb, extract) whose
    values are baked into the kernel as immediates (zero coefficients are
    skipped — the comb tensor is sparse by parity); the per-axis band
    matrices arrive as a VMEM input. ``cfg_key`` carries the static index
    structure (moments, basis, pair_index, idx00, window norm)."""
    moments, basis, pair_index_bytes, P, idx00, winnorm, sqrt_wx = cfg_key
    PhiY, comb, extract = tkey.payload
    pair_index = np.frombuffer(pair_index_bytes,
                               dtype=np.int32).reshape(P, P)
    Kp, M = comb.shape
    Sy = PhiY.shape[1]
    fill = float(fill_repr)
    cb = cols // _LANES

    def kernel(bands_ref, w_ref, wr_ref, wb_ref, wc_ref,
               x_ref, xr_ref, xb_ref, xc_ref, o_ref):
        wslab = jnp.concatenate([
            jnp.concatenate([w_ref[0], wr_ref[0]], axis=1),
            jnp.concatenate([wb_ref[0], wc_ref[0]], axis=1)], axis=0)
        xslab = jnp.concatenate([
            jnp.concatenate([x_ref[0], xr_ref[0]], axis=1),
            jnp.concatenate([xb_ref[0], xc_ref[0]], axis=1)], axis=0)
        r = o_ref.shape[1]
        fillv = jnp.asarray(fill, dtype=o_ref.dtype)

        acc_t = (jnp.float64 if o_ref.dtype == jnp.float64
                 else jnp.float32)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=acc_t)

        def vert(slab, t):
            # sum_y PhiY[y, t] * slab[y : y + r]  (profile immediates)
            acc = None
            for y in range(wh):
                c = float(PhiY[y, t])
                if c == 0.0:
                    continue
                term = c * slab[y:y + r, :]
                acc = term if acc is None else acc + term
            return acc

        for i in range(cb):
            wsub = wslab[:, i * _LANES:i * _LANES + 2 * _LANES]
            xsub = xslab[:, i * _LANES:i * _LANES + 2 * _LANES]
            SW = {t: vert(wsub, t)
                  for t in sorted({t for (_, t) in moments})}
            SX = {j: vert(xsub, j)
                  for j in sorted({j for (_, j) in basis})}
            T = [mm(SW[t], bands_ref[s]) for (s, t) in moments]
            rhs = jnp.stack([mm(SX[j], bands_ref[s])
                             for (s, j) in basis])
            if weighted:
                # positive-weight count: plain vertical sum of the
                # indicator, then the phi_0 (const 1/sqrt(wx)) band
                ind = (wsub > 0).astype(wsub.dtype)
                acc = ind[0:r, :]
                for y in range(1, wh):
                    acc = acc + ind[y:y + r, :]
                count = mm(acc, bands_ref[0]) * sqrt_wx
            else:
                # phi_0 x psi_0 is the constant 1/sqrt(wx*wy)
                count = T[idx00] * winnorm
            quorum = count >= (kmin - 0.5)
            gram = []
            for k in range(Kp):
                acc = None
                for mi in range(M):
                    c = float(comb[k, mi])
                    if c == 0.0:
                        continue
                    term = c * T[mi]
                    acc = term if acc is None else acc + term
                gram.append(acc if acc is not None
                            else jnp.zeros_like(count))
            coef, ok = cholesky_solve_planes(
                jnp.stack(gram), pair_index, rhs, quorum, rcond=rcond)
            y = None
            for p in range(P):
                c = float(extract[p])
                if c == 0.0:
                    continue
                term = c * coef[p]
                y = term if y is None else y + term
            if y is None:
                y = jnp.zeros_like(count)
            o_ref[0, :, i * _LANES:(i + 1) * _LANES] = jnp.where(
                ok, y, fillv).astype(o_ref.dtype)

    @jax.jit
    def call(wpad, xpad, bands):
        B, Rp, Cp = xpad.shape
        out_r = Rp - _HALO_R
        out_c = Cp - _LANES
        grid = (B, out_r // rows, out_c // cols)
        Sx = bands.shape[0]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        tile = pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                            memory_space=pltpu.VMEM)
        right = pl.BlockSpec(
            (1, rows, _LANES),
            lambda b, ri, ci: (b, ri, (ci + 1) * (cols // _LANES)),
            memory_space=pltpu.VMEM)
        bot = pl.BlockSpec(
            (1, _HALO_R, cols),
            lambda b, ri, ci: (b, (ri + 1) * (rows // _HALO_R), ci),
            memory_space=pltpu.VMEM)
        corner = pl.BlockSpec(
            (1, _HALO_R, _LANES),
            lambda b, ri, ci: (b, (ri + 1) * (rows // _HALO_R),
                               (ci + 1) * (cols // _LANES)),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            **params,
            in_specs=[
                pl.BlockSpec((Sx, 2 * _LANES, _LANES),
                             lambda b, ri, ci: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                tile, right, bot, corner,
                tile, right, bot, corner,
            ],
            out_specs=pl.BlockSpec((1, rows, cols),
                                   lambda b, ri, ci: (b, ri, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, out_r, out_c), xpad.dtype),
            interpret=interpret,
        )(bands, wpad, wpad, wpad, wpad, xpad, xpad, xpad, xpad)

    return call


def savgol_masked2d_fused_pallas(
        xzp: jax.Array, wp: jax.Array, *,
        half_window_x: int, half_window_y: int, poly_order: int,
        deriv_x: int = 0, deriv_y: int = 0,
        delta_x: float = 1.0, delta_y: float = 1.0,
        kmin: int, fill: float, rcond: float,
        weighted: bool = False,
        rows: int = 64, cols: int = 256,
        interpret: bool | None = None) -> jax.Array:
    """Fused masked 2D apply on BOUNDARY-PADDED inputs.

    ``xzp``: (..., R + 2*ny, C + 2*nx) mask-sanitized values (invalid = 0;
    weighted callers pre-multiply by the weights); ``wp``: matching
    weights/validity (0 = missing) — exactly the arrays the staged path
    feeds its bank correlations. Returns the (..., R, C) filtered output
    with ``fill`` at under-quorum / unidentifiable pixels."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx, ny, m = int(half_window_x), int(half_window_y), int(poly_order)
    wx, wy = 2 * nx + 1, 2 * ny + 1
    tables = tensor_tables_2d(nx, ny, m)
    extract = _extract_row(tables, deriv_x, deriv_y, delta_x, delta_y,
                           nx, ny)
    basis = tables["basis"]
    P = len(basis)

    dtype = xzp.dtype
    batch_shape = xzp.shape[:-2]
    Rp_in, Cp_in = xzp.shape[-2:]
    R, C = Rp_in - 2 * ny, Cp_in - 2 * nx
    if R < 1 or C < 1:
        raise ValueError("image smaller than the boundary pad")
    xb = xzp.reshape((-1, Rp_in, Cp_in))
    wb = wp.reshape((-1, Rp_in, Cp_in))

    rows = min(rows, _round_up(max(R, _HALO_R), _HALO_R))
    cols = min(cols, _round_up(max(C, _LANES), _LANES))
    Rp = _round_up(R, rows) + _HALO_R
    Cp = _round_up(C, cols) + _LANES
    # zero weight == missing: the tile-geometry pad IS truncate semantics
    pad = ((0, 0), (0, Rp - Rp_in), (0, Cp - Cp_in))
    xpad = jnp.pad(xb, pad)
    wpad = jnp.pad(wb, pad)

    from savgol_tpu.ops.pallas_conv import _valid_band_matrices
    PhiX = tables["PhiX"]
    bands = jnp.stack([_valid_band_matrices(
        jnp.asarray(PhiX[:, s], dtype=dtype))
        for s in range(PhiX.shape[1])])

    cfg_key = (tuple(tables["moments"]), tuple(basis),
               tables["pair_index"].tobytes(), P, tables["idx00"],
               float(np.sqrt(wx * wy)), float(np.sqrt(wx)))
    call = _masked2d_const_call(
        cfg_key, _TKey(tables["PhiY"], tables["comb"], extract),
        rows, cols, wy, bool(weighted), int(kmin), repr(float(fill)),
        float(rcond), bool(interpret))
    out = call(wpad, xpad, bands)
    return out[:, :R, :C].reshape(batch_shape + (R, C))
