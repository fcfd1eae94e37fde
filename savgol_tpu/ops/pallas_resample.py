"""Fused gather+evaluate Pallas kernel for ``savgol_resample``.

The recentered-plane resample (ops/nonuniform.py, method="auto") ends
with per-query PLANE GATHERS: (m+3) coefficient/normalizer planes taken
at each query's window-center index. XLA cannot know the centers are
CLUSTERED — resampling queries are (roughly) sorted, so each block of
consecutive queries reads from a narrow slice of the data axis — and
lowers the takes to general gathers. Honest chained-protocol numbers on
the 8x131k probe: this kernel 1.20 ms vs the XLA gather evaluation's
1.35 ms (a ~12% stage win; the path's former wall was the binary-search
``searchsorted``, fixed separately with ``method="sort"``).

This kernel exploits that: per query block, a scalar-prefetched base
index delivers TWO aligned plane-stack slabs (the classic halo trick),
and the per-query gather becomes a ONE-HOT MATMUL on the MXU —
slab (R, 2S) @ onehot (2S, Q) — followed by the Horner evaluation of
the derivative-adjusted polynomial, all in one VMEM pass. One-hot
operands are exact {0, 1}, so the dot at HIGHEST precision reproduces
the gathered values to the bf16x6 ~2^-48 class (the framework's
exact-f32 contract).

The kernel is only VALID when every query block's centers span at most
``SLAB - 1`` data positions past the block base. The caller computes
that fit as a scalar on device and ``lax.cond``s between this kernel
and the XLA gather path (ops/nonuniform.py), so arbitrary (sparse,
shuffled) queries stay correct — they just take the general path.

Plane-stack layout (built by the caller, rows R = (K+2)*B + 1):
  rows [j*B + b]       : b'_j = coef_{j+d} * (j+d)!/j!  (K = m+1-d
                         planes, row-major over batch b)
  rows [K*B + b]       : s   (per-window normalizer, per batch row)
  rows [(K+1)*B + b]   : ok  (quorum/identifiability, 0.0 / 1.0)
  row  [(K+2)*B]       : t   (shared abscissae)
Evaluation per query q, batch b:
  u = (tq[q] - t[ctr_q]) / s[b, ctr_q]
  y = (sum_j b'_j u^j) / s^d   where ok, else the static ``fill``

No reference analog: src/savgolFilter.c is uniform-grid only; the
behavior contract is ops/nonuniform.py::savgol_resample's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resample_eval_pallas", "RESAMPLE_SLAB", "RESAMPLE_QBLK"]

RESAMPLE_SLAB = 1024      # data columns per delivered slab block
RESAMPLE_QBLK = 512       # queries per grid step


def _round_up(a, b):
    return -(-a // b) * b


def _kernel(bases_ref, ctr_ref, tq_ref, p0_ref, p1_ref, o_ref, *,
            K: int, B: int, d: int, slab: int, fill: float):
    b = pl.program_id(0)
    base = bases_ref[b] * slab
    local = ctr_ref[0, :] - base                       # (Q,) int32
    # clamp for safety: out-of-range only happens when the caller's fit
    # check failed, in which case this kernel's output is discarded
    local = jnp.clip(local, 0, 2 * slab - 1)
    slab2 = jnp.concatenate([p0_ref[:, :], p1_ref[:, :]], axis=1)
    dtype = slab2.dtype
    q = local.shape[0]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * slab, q), 0)
    oneh = (rows2 == local[None, :]).astype(dtype)     # (2S, Q)
    g = jax.lax.dot_general(
        slab2, oneh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype)                  # (R, Q)
    sg = g[K * B:(K + 1) * B]                          # (B, Q)
    okg = g[(K + 1) * B:(K + 2) * B]                   # (B, Q)
    tg = g[(K + 2) * B]                                # (Q,)
    u = (tq_ref[0, :] - tg)[None, :] / sg              # (B, Q)
    acc = g[(K - 1) * B:K * B]
    for j in range(K - 2, -1, -1):
        acc = acc * u + g[j * B:(j + 1) * B]
    for _ in range(d):
        acc = acc / sg
    acc = jnp.where(okg > 0.5, acc, jnp.asarray(fill, dtype))
    o_ref[:, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "B", "d", "fill",
                                             "slab", "qblk", "interpret"))
def _call(planes, ctr, tq, bases, K, B, d, fill, slab, qblk, interpret):
    # fill arrives as repr(float) — a hashable jit key NaN cannot break
    R, Np = planes.shape
    nq = ctr.shape[-1]
    nblk = nq // qblk
    last = Np // slab - 1
    kernel = functools.partial(_kernel, K=K, B=B, d=d, slab=slab,
                               fill=float(fill))
    qspec_i = pl.BlockSpec((1, qblk), lambda b, base: (0, b),
                           memory_space=pltpu.VMEM)
    p0 = pl.BlockSpec((R, slab), lambda b, base: (0, base[b]),
                      memory_space=pltpu.VMEM)
    p1 = pl.BlockSpec(
        (R, slab), lambda b, base: (0, jnp.minimum(base[b] + 1, last)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[qspec_i, qspec_i, p0, p1],
        out_specs=pl.BlockSpec((B, qblk), lambda b, base: (0, b),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nq), planes.dtype),
        interpret=interpret,
    )(bases, ctr[None, :], tq[None, :], planes, planes)


def resample_block_fit(ctr, n_data: int):
    """Scalar bool: every ``RESAMPLE_QBLK`` query block's centers span
    at most the kernel's two-slab window (the dispatch predicate for
    :func:`resample_eval_pallas`; compute it OUTSIDE ``lax.cond``)."""
    slab, qblk = RESAMPLE_SLAB, RESAMPLE_QBLK
    nq = ctr.shape[-1]
    nqp = _round_up(max(nq, qblk), qblk)
    ctr_p = jnp.pad(ctr.astype(jnp.int32), (0, nqp - nq), mode="edge")
    blocks = ctr_p.reshape(nqp // qblk, qblk)
    npad = _round_up(max(n_data, slab), slab) + slab
    last = npad // slab - 1
    bases = jnp.clip(blocks.min(axis=1) // slab, 0, last - 1)
    return jnp.all(blocks.max(axis=1) - bases * slab <= 2 * slab - 1)


def resample_eval_pallas(planes, ctr, tq, *, K: int, B: int,
                         derivative: int, fill: float,
                         interpret: bool | None = None):
    """Evaluate the resample plane stack at query centers.

    ``planes``: (R, N) with R = (K+2)*B + 1 (layout in the module
    docstring); ``ctr``: (Nq,) int32 window-center indices; ``tq``:
    (Nq,) query abscissae in working dtype. Returns y (B, Nq) —
    GARBAGE unless :func:`resample_block_fit` holds; callers MUST
    dispatch on it (lax.cond to the XLA gather path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    slab, qblk = RESAMPLE_SLAB, RESAMPLE_QBLK
    R, N = planes.shape
    nq = ctr.shape[-1]
    nqp = _round_up(max(nq, qblk), qblk)
    npad = _round_up(max(N, slab), slab) + slab   # +1 slab of headroom
    planes_p = jnp.pad(planes, ((0, 0), (0, npad - N)))
    ctr_p = jnp.pad(ctr.astype(jnp.int32), (0, nqp - nq), mode="edge")
    tq_p = jnp.pad(tq, (0, nqp - nq))
    blocks = ctr_p.reshape(nqp // qblk, qblk)
    last = npad // slab - 1
    bases = jnp.clip(blocks.min(axis=1) // slab, 0, last - 1)
    y = _call(planes_p, ctr_p, tq_p, bases, int(K), int(B),
              int(derivative), repr(float(fill)), slab, qblk,
              bool(interpret))
    return y[:, :nq]
