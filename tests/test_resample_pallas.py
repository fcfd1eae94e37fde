"""One-hot slab-matmul resample kernel (ops/pallas_resample.py).

The kernel gathers the recentered coefficient planes with an exact
one-hot matmul and Horner-evaluates in one pass, so interpret-mode
output must match the XLA gather evaluation of the SAME planes almost
exactly (identical math; the dot contributes one exact product per
output). The real-chip twin lives in tests/test_hw_parity.py."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savgol_tpu.ops.nonuniform import (_fit_coeffs, _resample_eval_diff,
                                       _staged_taps, savgol_resample)
from savgol_tpu.ops.pallas_resample import (RESAMPLE_QBLK,
                                            resample_block_fit,
                                            resample_eval_pallas)

F32 = jnp.float32


def _planes(rng, N, B, n, m, d, hole_frac=0.1):
    ws = 2 * n + 1
    t = np.sort(rng.uniform(0, 100, N)).astype(np.float32)
    x = (np.sin(0.3 * t) + 0.05 * rng.standard_normal((B, N))).astype(
        np.float32)
    x[rng.random(x.shape) < hole_frac] = np.nan
    mask = np.isfinite(x)
    xz = jnp.asarray(np.where(mask, x, 0.0))
    wts = jnp.asarray(mask.astype(np.float32))
    tb = jnp.broadcast_to(jnp.asarray(t), xz.shape)
    coef, s_pl, ok_pl = _fit_coeffs(_staged_taps(xz, wts, tb, n), ws, m,
                                    m + 1, 1e-6, F32)
    K = m + 1 - d
    bpl = jnp.stack([coef[j + d] * float(math.factorial(j + d)
                                         // math.factorial(j))
                     for j in range(K)])
    return x, t, bpl, s_pl, ok_pl.astype(F32), K


def _ctr(t, tq, n):
    N = t.shape[-1]
    ins = jnp.searchsorted(jnp.asarray(t), jnp.asarray(tq))
    return (jnp.clip(ins - n, 0, N - (2 * n + 1)) + n).astype(jnp.int32)


def test_kernel_matches_xla_eval_and_direct():
    rng = np.random.default_rng(0)
    N, Nq, B, n, m, d = 3000, 2000, 3, 6, 3, 1
    x, t, bpl, s_pl, okf, K = _planes(rng, N, B, n, m, d)
    tq = np.linspace(-2, 102, Nq).astype(np.float32)
    ctr = _ctr(t, tq, n)
    assert bool(resample_block_fit(ctr, N))
    stack = jnp.concatenate([bpl.reshape(K * B, N), s_pl, okf,
                             jnp.asarray(t)[None]], axis=0)
    yk = np.asarray(resample_eval_pallas(
        stack, ctr, jnp.asarray(tq), K=K, B=B, derivative=d, fill=0.0,
        interpret=True))
    # direct (query-centered) path: agreement to the recentering class
    yd = np.asarray(savgol_resample(
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(tq), half_window=n,
        poly_order=m, derivative=d, fill=0.0, method="direct"))
    scale = max(1.0, np.abs(yd).max())
    assert np.abs(yk - yd).max() <= 1e-4 * scale
    # the differentiable dispatcher picks the kernel branch here
    op = _resample_eval_diff(K, d, repr(0.0))
    yo = np.asarray(op(bpl, s_pl, okf, jnp.asarray(t), ctr,
                       jnp.asarray(tq)))
    np.testing.assert_array_equal(yo, yk)


def test_shuffled_queries_fall_back_and_agree():
    rng = np.random.default_rng(1)
    N, Nq, B, n, m, d = 3000, 1024, 2, 5, 2, 0
    x, t, bpl, s_pl, okf, K = _planes(rng, N, B, n, m, d)
    tq = rng.uniform(0, 100, Nq).astype(np.float32)   # shuffled
    ctr = _ctr(t, tq, n)
    assert not bool(resample_block_fit(ctr, N))
    op = _resample_eval_diff(K, d, repr(float("nan")))
    yo = np.asarray(op(bpl, s_pl, okf, jnp.asarray(t), ctr,
                       jnp.asarray(tq)))
    yd = np.asarray(savgol_resample(
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(tq), half_window=n,
        poly_order=m, derivative=d, method="direct"))
    assert np.array_equal(np.isnan(yo), np.isnan(yd))
    fin = np.isfinite(yd)
    scale = max(1.0, np.abs(yd[fin]).max())
    assert np.abs((yo - yd)[fin]).max() <= 1e-4 * scale


def test_quorum_fill_rides_the_kernel():
    rng = np.random.default_rng(2)
    N, B, n, m, d = 2000, 2, 5, 2, 0
    x, t, bpl, s_pl, okf, K = _planes(rng, N, B, n, m, d,
                                      hole_frac=0.6)
    assert float(okf.min()) == 0.0          # some windows under quorum
    tq = np.linspace(1, 99, 512).astype(np.float32)
    ctr = _ctr(t, tq, n)
    stack = jnp.concatenate([bpl.reshape(K * B, N), s_pl, okf,
                             jnp.asarray(t)[None]], axis=0)
    yk = np.asarray(resample_eval_pallas(
        stack, ctr, jnp.asarray(tq), K=K, B=B, derivative=d,
        fill=-7.5, interpret=True))
    okg = np.asarray(jnp.take(okf, ctr, axis=-1))
    assert (yk[okg < 0.5] == -7.5).all()
    assert np.isfinite(yk).all()


def test_gradient_routes_through_twin():
    rng = np.random.default_rng(3)
    N, Nq, B, n, m, d = 1000, 640, 2, 4, 2, 1
    x, t, bpl, s_pl, okf, K = _planes(rng, N, B, n, m, d, hole_frac=0.0)
    tq = np.linspace(5, 95, Nq).astype(np.float32)
    ctr = _ctr(t, tq, n)
    op = _resample_eval_diff(K, d, repr(0.0))

    def loss(fn):
        return jax.grad(lambda b: jnp.sum(
            fn(b, s_pl, okf, jnp.asarray(t), ctr,
               jnp.asarray(tq)) ** 2))(bpl)

    # twin == the XLA evaluation with the same planes
    def xla_eval(bpl_, s_, ok_, tv_, ctr_, tq_):
        bg = jnp.take(bpl_, ctr_, axis=-1)
        sg = jnp.take(s_, ctr_, axis=-1)
        okg = jnp.take(ok_, ctr_, axis=-1)
        u = (tq_ - jnp.take(tv_, ctr_))[None, :] / sg
        acc = bg[K - 1]
        for j in range(K - 2, -1, -1):
            acc = acc * u + bg[j]
        return jnp.where(okg > 0.5, acc / sg ** d, 0.0)

    np.testing.assert_allclose(np.asarray(loss(op)),
                               np.asarray(loss(xla_eval)), atol=1e-5)


def test_partial_last_block_edge_padding():
    # Nq not a multiple of the query block: the padded tail repeats the
    # last center (edge mode) so the block-fit predicate cannot be
    # spuriously broken by zero padding.
    rng = np.random.default_rng(4)
    N, B, n, m, d = 2500, 1, 4, 2, 0
    x, t, bpl, s_pl, okf, K = _planes(rng, N, B, n, m, d)
    tq = np.linspace(90, 99, RESAMPLE_QBLK + 37).astype(np.float32)
    ctr = _ctr(t, tq, n)
    assert bool(resample_block_fit(ctr, N))
    stack = jnp.concatenate([bpl.reshape(K * B, N), s_pl, okf,
                             jnp.asarray(t)[None]], axis=0)
    yk = np.asarray(resample_eval_pallas(
        stack, ctr, jnp.asarray(tq), K=K, B=B, derivative=d, fill=0.0,
        interpret=True))
    yd = np.asarray(savgol_resample(
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(tq), half_window=n,
        poly_order=m, derivative=d, fill=0.0, method="direct"))
    assert yk.shape == yd.shape
    scale = max(1.0, np.abs(yd).max())
    assert np.abs(yk - yd).max() <= 1e-4 * scale
