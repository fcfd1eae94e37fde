"""Fully-fused masked 1D Savitzky-Golay kernel (normal solver) for TPU.

The staged masked pipeline (ops/masked.py) is bound by plane traffic,
not math: the Kp + (m+1) Gram/rhs bank correlations write ~20 planes to
HBM and the plane-Cholesky solve reads them back — ~170 B/sample against
an irreducible x + mask in / y out of ~13 B/sample. This kernel does the
whole thing per VMEM tile in ONE pass:

  per 128-lane output block (the 2-band shifted-slab form of
  ops/pallas_conv.py::_bank_mxu_kernel):
    mom_s   = (w-slab)  @ band_pair[phi2_s]            (S matmuls,
              S = min(2m+1, ws) orthonormal moment stencils)
    gram_k  = sum_s comb[k, s] * mom_s                 (VPU, baked O(1)
              coefficients — phi_a*phi_b expands EXACTLY in the
              degree-<=2m grid basis, so S moments reconstruct all
              Kp = (m+1)(m+2)/2 pair correlations)
    rhs_j   = (wx-slab) @ band_pair[phi_j]             (m+1 matmuls)
    count   = (ind-slab) @ band_pair[ones]             (1 matmul)
    coef    = plane-Cholesky solve in registers (ops/lsq.py — the SAME
              unrolled dual-factor + compensated-refinement routine the
              staged path runs; pure jnp elementwise is legal in Pallas)
    y       = extract . coef, under-quorum -> fill

Gram/rhs planes never touch HBM. HIGHEST matmuls keep the f32-exact
accuracy contract; the per-sample MXU cost is (S+m+2) * 256 MACs x 6
passes — the moment form cut it 21 -> 15 matmuls for m=4 (the 1D
instance of the 2D kernel's tensor-moment trick), raising the kernel's
MXU roofline from ~3.1 to ~4.3 Gs/s for m=4 on v5e.

Gradients: wrapped by ops/masked.py with a custom VJP through the staged
jnp twin (same pattern as ops/apply.py's Pallas wrappers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from savgol_tpu.ops.lsq import cholesky_solve_planes

__all__ = ["savgol_masked1d_fused_pallas"]

_LANES = 128
_SUBLANES = 8


def _round_up(a, b):
    return -(-a // b) * b


def _masked1d_kernel(bands_ref, ex_ref, x_ref, xh_ref, w_ref, wh_ref,
                     o_ref, *, cb: int, S: int, kk: int, comb,
                     pair_index, kmin: int, fill: float, n_total: int,
                     mxu_precision):
    """One (rows, cols) output tile; bands_ref: (S + kk + 1, 2L, L).

    The Gram planes are reconstructed from the S weight-moment
    correlations with the baked ``comb`` (Kp, S) coefficients (see
    ``savgol_masked1d_fused_pallas``) — S = min(2m+1, ws) matmuls
    replace the Kp = (m+1)(m+2)/2 direct pair correlations."""
    ci = pl.program_id(1)
    cols = cb * _LANES
    xw = jnp.concatenate([x_ref[:, :], xh_ref[:, :]], axis=1)
    ww = jnp.concatenate([w_ref[:, :], wh_ref[:, :]], axis=1)
    # zero everything past the true padded length: masked reads beyond it
    # are ARBITRARY (NaN in interpret mode) and w = 0 is the correct
    # truncate semantics for synthetic positions
    col = jax.lax.broadcasted_iota(jnp.int32, (1, xw.shape[1]), 1)
    inside = ci * cols + col < n_total
    ww = jnp.where(inside, ww, 0.0)
    valid = ww > 0
    xz = jnp.where(valid, xw, 0.0) * ww        # bool masks: * 1
    ind = valid.astype(xw.dtype)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=jnp.float32)

    fillv = jnp.asarray(fill, dtype=o_ref.dtype)
    Kp = comb.shape[0]
    for i in range(cb):
        sl = slice(i * _LANES, i * _LANES + 2 * _LANES)
        ws_s = ww[:, sl]
        xz_s = xz[:, sl]
        in_s = ind[:, sl]
        moms = [mm(ws_s, bands_ref[s]) for s in range(S)]
        planes = []
        for k in range(Kp):
            acc = None
            for s in range(S):
                c = float(comb[k, s])
                if c == 0.0:
                    continue
                term = c * moms[s]
                acc = term if acc is None else acc + term
            planes.append(acc)
        gram = jnp.stack(planes)
        rhs = jnp.stack([mm(xz_s, bands_ref[S + j]) for j in range(kk)])
        count = mm(in_s, bands_ref[S + kk])
        quorum = count >= (kmin - 0.5)
        coef, ok = cholesky_solve_planes(gram, pair_index, rhs, quorum)
        y = jnp.zeros_like(count)
        for a in range(kk):
            y = y + ex_ref[0, a] * coef[a]
        o_ref[:, i * _LANES:(i + 1) * _LANES] = jnp.where(
            ok, y, fillv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "S", "kk",
                                             "comb_key", "pair_key",
                                             "kmin", "fill", "n_total",
                                             "interpret",
                                             "mxu_precision"))
def _masked1d_call(xpad, wpad, bands, extract, rows, cols, S, kk,
                   comb_key, pair_key, kmin, fill, n_total, interpret,
                   mxu_precision):
    # fill arrives as repr(float) — a hashable jit key NaN cannot break
    fill = float(fill)
    B, Np = xpad.shape
    n_out = Np - _LANES
    cb = cols // _LANES
    last128 = Np // _LANES - 1
    kernel = functools.partial(
        _masked1d_kernel, cb=cb, S=S, kk=kk,
        comb=np.asarray(comb_key.arr),
        pair_index=np.asarray(pair_key.arr), kmin=kmin, fill=fill,
        n_total=n_total, mxu_precision=mxu_precision)
    halo_spec = pl.BlockSpec(
        (rows, _LANES),
        lambda bi, ci: (bi, jnp.minimum((ci + 1) * (cols // _LANES),
                                        last128)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // rows, n_out // cols),
        in_specs=[
            pl.BlockSpec((S + kk + 1, 2 * _LANES, _LANES),
                         lambda bi, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            halo_spec,
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            halo_spec,
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out), xpad.dtype),
        interpret=interpret,
    )(bands, extract, xpad, xpad, wpad, wpad)


class _PairKey:
    """Hashable jit-static wrapper for a host numpy table (dtype kept)."""

    def __init__(self, arr, dtype=np.int32):
        self.arr = np.ascontiguousarray(np.asarray(arr, dtype=dtype))
        self._key = (self.arr.shape, str(self.arr.dtype),
                     self.arr.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _PairKey) and self._key == other._key


def savgol_masked1d_fused_pallas(xz, wts, pair_w, qw, extract, *,
                                 half_window: int, kmin: int, fill: float,
                                 rows: int = 64, cols: int = 512,
                                 interpret: bool | None = None,
                                 mxu_precision=None):
    """Fused masked apply: ``xz``/``wts`` are the UNPADDED mask-sanitized
    values and weights, (..., N); ``pair_w`` (Kp, ws) / ``qw`` (m+1, ws)
    the host f64 stencils; ``extract`` (m+1,) the derivative-extraction
    row. Returns the (..., N) filtered output with ``fill`` at
    under-quorum positions (boundary='truncate' semantics — callers with
    pad boundaries pre-pad values and weights and slice)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    n = int(half_window)
    ws = 2 * n + 1
    Kp = pair_w.shape[0]
    kk = qw.shape[0]
    dtype = xz.dtype
    batch_shape = xz.shape[:-1]
    N = xz.shape[-1]
    xb = xz.reshape(-1, N)
    wb = wts.reshape(-1, N)
    B = xb.shape[0]

    from savgol_tpu.ops.pallas_conv import _valid_band_matrices
    # Moment decomposition (host f64): every pair stencil phi_a*phi_b is
    # a grid function of polynomial degree <= 2m on the ws-point window,
    # so it expands EXACTLY in an orthonormal grid basis of
    # S = min(2m+1, ws) columns: pair_w[k] = sum_s comb[k, s] * Q2[:, s].
    # The kernel then correlates the weights with the S moment stencils
    # (S matmuls) and reconstructs the Kp Gram planes as O(1)-coefficient
    # VPU combinations — (Kp - S) fewer HIGHEST matmuls per block (e.g.
    # 15 -> 9 for m=4) with the same exact-f32 error class (the 2D
    # tensor-moment kernel's argument, ops/pallas_masked2d.py).
    pair_np = np.asarray(pair_w, dtype=np.float64)
    S = min(2 * (kk - 1) + 1, ws)
    t = (np.arange(ws, dtype=np.float64) - n) / max(n, 1)
    V2 = np.vander(t, S, increasing=True)
    Q2, R2 = np.linalg.qr(V2)
    sg = np.sign(np.diag(R2)).copy()
    sg[sg == 0] = 1.0
    Q2 = Q2 * sg
    comb = pair_np @ Q2                                  # (Kp, S)
    comb[np.abs(comb) < 1e-12 * np.abs(comb).max()] = 0.0  # parity zeros
    resid = np.abs(comb @ Q2.T - pair_np).max()
    if resid > 1e-9:
        # extreme orders push the degree-2m Vandermonde QR past clean
        # f64 reconstruction — fall back to direct pair correlation
        # (identity comb), trading the saved matmuls for exactness
        S = Kp
        Q2 = pair_np.T
        comb = np.eye(Kp)
    stencils = np.concatenate([Q2.T, np.asarray(qw),
                               np.ones((1, ws))]).astype(np.float64)
    bands = jnp.stack([_valid_band_matrices(
        jnp.asarray(stencils[i], dtype=dtype))
        for i in range(S + kk + 1)])
    ex = jnp.asarray(np.asarray(extract, dtype=np.float64)[None, :],
                     dtype=dtype)

    # truncate-boundary pad + tile-geometry pad (zero weight = missing)
    rows = min(rows, _round_up(B, _SUBLANES))
    n_out_p = _round_up(N, cols)
    Np = n_out_p + _LANES
    Bp = _round_up(B, rows)
    xp = jnp.pad(xb, ((0, Bp - B), (n, Np - N - n)))
    wp = jnp.pad(wb, ((0, Bp - B), (n, Np - N - n)))
    # pair_index for the Kp gram planes
    k = kk
    pidx = np.zeros((k, k), np.int32)
    c = 0
    for a in range(k):
        for b in range(a, k):
            pidx[a, b] = pidx[b, a] = c
            c += 1
    out = _masked1d_call(xp, wp, bands, ex, rows, cols, S, kk,
                         _PairKey(comb, dtype=np.float64),
                         _PairKey(pidx), int(kmin), repr(float(fill)),
                         N + 2 * n, interpret, mxu_precision)
    return out[:B, :N].reshape(batch_shape + (N,))
