"""Pallas TPU kernels for the per-position plane-Cholesky solves.

The masked paths solve one tiny SPD system per output position, stored
as Gram ENTRY PLANES (ops/lsq.py::cholesky_solve_planes). As pure jnp
that unrolled factorization is ~k^3/3 + k^2 elementwise plane ops — at
2D scale (P = 10 terms -> 55 Gram planes, 166 factor ops + a compensated
refinement) the op graph exceeds XLA's fusion budget, every temporary
L plane round-trips HBM, and the measured rate collapses to ~9 Mpix/s
(vs a ~1.5 Gpix/s pipeline roofline; v5e, probe_masked.py). These
kernels run the SAME unrolled solve per VMEM tile: gram/rhs planes are
read once, every temporary lives in registers/VMEM, coef planes are
written once — HBM traffic is exactly the roofline model's.

The kernel bodies delegate to lsq.py's plane routines (pure elementwise
jnp — legal inside Pallas), so the math has ONE home; Mosaic lowers the
sqrt/div/EFT chains onto the VPU. Gradients: the wrappers carry a
custom VJP through the jnp twin (the filter is not linear in the mask,
but the twin IS the reference implementation — same pattern as
ops/apply.py's Pallas wrappers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from savgol_tpu.ops.lsq import cholesky_solve_planes, cholesky_solve_planes_dd

__all__ = ["plane_cholesky_solve", "plane_cholesky_solve_dd"]

_LANES = 128
_SUBLANES = 8
# VMEM budget for (gram + rhs + coef + live L) tiles, double-buffered
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_tile(n_planes: int, esize: int, positions: int):
    """(rows, cols) tile for ~n_planes live planes within the budget."""
    cols = _LANES * max(1, min(8, positions // _LANES or 1))
    rows = _SUBLANES
    def fp(r, c):
        return 2 * esize * n_planes * r * c
    while fp(rows * 2, cols) <= _VMEM_BUDGET and rows < 256:
        rows *= 2
    while fp(rows, cols) > _VMEM_BUDGET and cols > _LANES:
        cols //= 2
    return rows, cols


def _solve_kernel(gram_ref, rhs_ref, quo_ref, coef_ref, ok_ref, *,
                  pair_index, rcond):
    gram = gram_ref[...]
    rhs = rhs_ref[...]
    quorum = quo_ref[...] > 0
    coef, ok = cholesky_solve_planes(gram, pair_index, rhs, quorum,
                                     rcond=rcond)
    coef_ref[...] = coef.astype(coef_ref.dtype)
    ok_ref[...] = ok.astype(ok_ref.dtype)


def _solve_kernel_dd(ghi_ref, glo_ref, rhi_ref, rlo_ref, quo_ref,
                     coef_ref, ok_ref, *, pair_index, rcond):
    quorum = quo_ref[...] > 0
    coef, ok = cholesky_solve_planes_dd(
        ghi_ref[...], glo_ref[...], pair_index,
        rhi_ref[...], rlo_ref[...], quorum, rcond=rcond)
    coef_ref[...] = coef.astype(coef_ref.dtype)
    ok_ref[...] = ok.astype(ok_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pair_key", "rcond", "rows",
                                             "cols", "interpret"))
def _plane_solve_call(gram, rhs, quo, pair_key, rcond, rows, cols,
                      interpret):
    pair_index = np.asarray(pair_key.arr)
    kp, *batch = gram.shape
    k = rhs.shape[0]
    pos = 1
    for s in batch:
        pos *= s
    g2 = gram.reshape(kp, pos)
    r2 = rhs.reshape(k, pos)
    q2 = quo.reshape(pos)
    padded = -(-pos // (rows * cols)) * (rows * cols)
    g2 = jnp.pad(g2, ((0, 0), (0, padded - pos)))
    r2 = jnp.pad(r2, ((0, 0), (0, padded - pos)))
    # padding positions get quorum=0 -> identity systems, discarded
    q2 = jnp.pad(q2, (0, padded - pos)).astype(jnp.float32)
    R = padded // cols
    g3 = g2.reshape(kp, R, cols)
    r3 = r2.reshape(k, R, cols)
    q3 = q2.reshape(R, cols)
    grid = (R // rows,)
    kernel = functools.partial(_solve_kernel, pair_index=pair_index,
                               rcond=rcond)
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    coef, okf = pl.pallas_call(
        kernel,
        grid=grid,
        **params,
        in_specs=[
            pl.BlockSpec((kp, rows, cols), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, rows, cols), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((k, rows, cols), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((k, R, cols), gram.dtype),
                   jax.ShapeDtypeStruct((R, cols), jnp.float32)),
        interpret=interpret,
    )(g3, r3, q3)
    coef = coef.reshape(k, padded)[:, :pos].reshape((k,) + tuple(batch))
    ok = (okf.reshape(padded)[:pos] > 0).reshape(tuple(batch))
    return coef, ok


@functools.partial(jax.jit, static_argnames=("pair_key", "rcond", "rows",
                                             "cols", "interpret"))
def _plane_solve_call_dd(ghi, glo, rhi, rlo, quo, pair_key, rcond, rows,
                         cols, interpret):
    pair_index = np.asarray(pair_key.arr)
    kp, *batch = ghi.shape
    k = rhi.shape[0]
    pos = 1
    for s in batch:
        pos *= s
    pad_to = -(-pos // (rows * cols)) * (rows * cols)

    def prep(a, lead):
        a2 = a.reshape(lead, pos)
        return jnp.pad(a2, ((0, 0), (0, pad_to - pos))).reshape(
            lead, pad_to // cols, cols)

    g3h, g3l = prep(ghi, kp), prep(glo, kp)
    r3h, r3l = prep(rhi, k), prep(rlo, k)
    q3 = jnp.pad(quo.reshape(pos).astype(jnp.float32),
                 (0, pad_to - pos)).reshape(pad_to // cols, cols)
    R = pad_to // cols
    grid = (R // rows,)
    kernel = functools.partial(_solve_kernel_dd, pair_index=pair_index,
                               rcond=rcond)
    plane = lambda lead: pl.BlockSpec((lead, rows, cols),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    coef, okf = pl.pallas_call(
        kernel,
        grid=grid,
        **params,
        in_specs=[plane(kp), plane(kp), plane(k), plane(k),
                  pl.BlockSpec((rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(plane(k),
                   pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((k, R, cols), ghi.dtype),
                   jax.ShapeDtypeStruct((R, cols), jnp.float32)),
        interpret=interpret,
    )(g3h, g3l, r3h, r3l, q3)
    coef = coef.reshape(k, pad_to)[:, :pos].reshape((k,) + tuple(batch))
    ok = (okf.reshape(pad_to)[:pos] > 0).reshape(tuple(batch))
    return coef, ok


class _PairKey:
    """Hashable wrapper for the static pair_index table."""

    def __init__(self, arr):
        self.arr = np.asarray(arr, dtype=np.int32)
        self._key = (self.arr.shape, self.arr.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _PairKey) and self._key == other._key


def _interpret_default():
    return jax.default_backend() != "tpu"


def _raw_plane_solve(gram, pair_index, rhs, quorum, rcond=None,
                     interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    kp = gram.shape[0]
    k = rhs.shape[0]
    n_live = kp + 2 * k + k * (k + 1) // 2 + 4
    pos = int(np.prod(gram.shape[1:]))
    rows, cols = _pick_tile(n_live, gram.dtype.itemsize, pos)
    return _plane_solve_call(gram, rhs, quorum, _PairKey(pair_index),
                             rcond, rows, cols, interpret)


def _raw_plane_solve_dd(gram_hi, gram_lo, pair_index, rhs_hi, rhs_lo,
                        quorum, rcond=None, interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    kp = gram_hi.shape[0]
    k = rhs_hi.shape[0]
    n_live = 2 * (kp + 2 * k + k * (k + 1) // 2) + 8
    pos = int(np.prod(gram_hi.shape[1:]))
    rows, cols = _pick_tile(n_live, gram_hi.dtype.itemsize, pos)
    return _plane_solve_call_dd(gram_hi, gram_lo, rhs_hi, rhs_lo,
                                quorum, _PairKey(pair_index), rcond, rows,
                                cols, interpret)


# ---------------------------------------------------------------------------
# public entries: TPU -> fused Pallas kernel, elsewhere -> the jnp twin;
# gradients always flow through the jnp twin (Pallas has no autodiff)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _solve_diff(pair_key, rcond, gram, rhs, quof):
    if jax.default_backend() == "tpu":
        coef, ok = _raw_plane_solve(gram, pair_key.arr, rhs, quof > 0,
                                    rcond=rcond)
    else:
        coef, ok = cholesky_solve_planes(gram, pair_key.arr, rhs,
                                         quof > 0, rcond=rcond)
    return coef, ok.astype(gram.dtype)


def _solve_fwd(pair_key, rcond, gram, rhs, quof):
    out = _solve_diff(pair_key, rcond, gram, rhs, quof)
    return out, (gram, rhs, quof)


def _solve_bwd(pair_key, rcond, res, cts):
    gram, rhs, quof = res
    g_coef, _ = cts          # ok is piecewise constant — no gradient

    def twin(g, r):
        return cholesky_solve_planes(g, pair_key.arr, r, quof > 0,
                                     rcond=rcond)[0]

    _, vjp = jax.vjp(twin, gram, rhs)
    g_gram, g_rhs = vjp(g_coef)
    return g_gram, g_rhs, jnp.zeros_like(quof)


_solve_diff.defvjp(_solve_fwd, _solve_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _solve_diff_dd(pair_key, rcond, ghi, glo, rhi, rlo, quof):
    # hardware-only: interpret-mode discharge of the dd op chain scales
    # explosively with k (k=3 ~3 s, k=5 > 2 min measured) — off-TPU the
    # jnp twin is the implementation, not an emulation
    if jax.default_backend() == "tpu":
        coef, ok = _raw_plane_solve_dd(ghi, glo, pair_key.arr, rhi, rlo,
                                       quof > 0, rcond=rcond,
                                       interpret=False)
    else:
        coef, ok = cholesky_solve_planes_dd(ghi, glo, pair_key.arr, rhi,
                                            rlo, quof > 0, rcond=rcond)
    return coef, ok.astype(ghi.dtype)


def _solve_dd_fwd(pair_key, rcond, ghi, glo, rhi, rlo, quof):
    out = _solve_diff_dd(pair_key, rcond, ghi, glo, rhi, rlo, quof)
    return out, (ghi, glo, rhi, rlo, quof)


def _solve_dd_bwd(pair_key, rcond, res, cts):
    ghi, glo, rhi, rlo, quof = res
    g_coef, _ = cts

    def twin(gh, gl, rh, rl):
        return cholesky_solve_planes_dd(gh, gl, pair_key.arr, rh, rl,
                                        quof > 0, rcond=rcond)[0]

    _, vjp = jax.vjp(twin, ghi, glo, rhi, rlo)
    g_gh, g_gl, g_rh, g_rl = vjp(g_coef)
    return g_gh, g_gl, g_rh, g_rl, jnp.zeros_like(quof)


_solve_diff_dd.defvjp(_solve_dd_fwd, _solve_dd_bwd)


def plane_cholesky_solve(gram, pair_index, rhs, quorum, rcond=None):
    """Fused per-position SPD solve on Gram entry planes.

    Same contract as ops/lsq.py::cholesky_solve_planes (including the
    compensated refinement): one VMEM pass on TPU, the jnp twin
    elsewhere; differentiable in (gram, rhs) through the twin's VJP.
    Returns ``(coef, ok)``.
    """
    coef, okf = _solve_diff(_PairKey(pair_index),
                            None if rcond is None else float(rcond),
                            gram, rhs, quorum.astype(gram.dtype))
    return coef, okf > 0


def plane_cholesky_solve_dd(gram_hi, gram_lo, pair_index, rhs_hi, rhs_lo,
                            quorum, rcond=None):
    """Fused double-word plane solve (ops/lsq.py::cholesky_solve_planes_dd
    in one VMEM pass on TPU, jnp twin elsewhere; differentiable).
    Returns ``(coef, ok)``."""
    coef, okf = _solve_diff_dd(_PairKey(pair_index),
                               None if rcond is None else float(rcond),
                               gram_hi, gram_lo, rhs_hi, rhs_lo,
                               quorum.astype(gram_hi.dtype))
    return coef, okf > 0
