"""Fused masked-2D Pallas kernel (ops/pallas_masked2d.py).

The kernel reformulates the masked bivariate Gram as a fixed combination
of separable tensor moments (see the module docstring) — a DIFFERENT
basis than the staged path's joint QR — so parity is checked two ways:
against the staged f32 path on determined pixels (both are f32 normal
equations; their spread is bounded by each one's own distance to f64)
and against the f64 staged oracle directly. All runs here are
interpret-mode on CPU; the real-chip twin of these checks lives in
tests/test_hw_parity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savgol_tpu.ops.masked import _masked2d_fused_diff, savgol2d_apply_masked
from savgol_tpu.ops.pallas_masked2d import (fused2d_supported,
                                            savgol_masked2d_fused_pallas,
                                            tensor_tables_2d)


def _holed(rng, shape, frac=0.15, dtype=np.float32):
    img = rng.standard_normal(shape).astype(dtype)
    img[rng.random(shape) < frac] = np.nan
    return img


def _well_covered(img, nx, ny, frac=0.7):
    """Pixels whose window keeps >= ``frac`` of its samples: both f32
    formulations are normal equations, and hole-starved windows amplify
    their differing Gram rounding by cond^2 — comparing there measures
    conditioning, not kernel correctness (the f64 oracle lanes own that
    regime; same rule as bench.py's masked gate)."""
    from scipy.ndimage import uniform_filter
    m = np.isfinite(img).astype(np.float64)
    area = (2 * nx + 1) * (2 * ny + 1)
    cov = uniform_filter(m, size=(2 * ny + 1, 2 * nx + 1),
                         mode="constant") * area
    return cov >= frac * area


def _fused(img, *, nx, ny, m, dx=0, dy=0, kmin=None, fill=0.0,
           rcond=1e-6, weighted=False, wts=None, **kw):
    mask = np.isfinite(img)
    xz = jnp.asarray(np.where(mask, img, 0.0))
    w = jnp.asarray(wts if wts is not None else mask.astype(img.dtype))
    pad = [(0, 0)] * (img.ndim - 2) + [(ny, ny), (nx, nx)]
    nterms = sum(1 for t in range(m + 1) for _ in range(t + 1))
    return savgol_masked2d_fused_pallas(
        jnp.pad(xz * w if weighted else xz, pad), jnp.pad(w, pad),
        half_window_x=nx, half_window_y=ny, poly_order=m,
        deriv_x=dx, deriv_y=dy, kmin=kmin or nterms, fill=fill,
        rcond=rcond, weighted=weighted, interpret=True, **kw)


def test_fused_matches_f64_oracle():
    rng = np.random.default_rng(0)
    img = _holed(rng, (48, 96))
    y64 = np.asarray(savgol2d_apply_masked(
        jnp.asarray(img.astype(np.float64)), half_window_x=2,
        half_window_y=2, poly_order=2, fill=np.nan, method="xla"))
    yf = np.asarray(_fused(img, nx=2, ny=2, m=2, fill=np.nan))
    ok = np.isfinite(y64) & np.isfinite(yf)
    assert ok.mean() > 0.95
    assert np.abs(yf - y64)[ok].max() < 5e-5


def test_fused_matches_staged_f32():
    rng = np.random.default_rng(1)
    img = _holed(rng, (40, 200))
    ys = np.asarray(savgol2d_apply_masked(
        jnp.asarray(img), half_window_x=2, half_window_y=2,
        poly_order=2, fill=np.nan, method="xla"))
    yf = np.asarray(_fused(img, nx=2, ny=2, m=2, fill=np.nan))
    ok = np.isfinite(ys) & np.isfinite(yf)
    assert np.abs(yf - ys)[ok & _well_covered(img, 2, 2)].max() < 5e-5
    assert np.abs(yf - ys)[ok].max() < 5e-4


def test_polynomial_reproduction_through_holes():
    # an order-<=m surface is reproduced exactly (up to f32) wherever the
    # fit is determined, holes and truncated edges included
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:40, 0:72].astype(np.float64)
    surf = 2.0 + 0.5 * xx - 0.25 * yy + 0.01 * xx * yy
    img = surf.astype(np.float32)
    img[rng.random(img.shape) < 0.2] = np.nan

    y = np.asarray(_fused(img, nx=3, ny=3, m=2, fill=np.nan))
    ok = np.isfinite(y)
    assert ok.mean() > 0.9
    assert np.abs(y - surf)[ok].max() < 2e-3   # |surf| up to ~40

    ddx = np.asarray(_fused(img, nx=3, ny=3, m=2, dx=1, fill=np.nan))
    ref = 0.5 + 0.01 * yy
    ok = np.isfinite(ddx)
    assert np.abs(ddx - ref)[ok].max() < 2e-3

    dxy = np.asarray(_fused(img, nx=3, ny=3, m=2, dx=1, dy=1,
                            fill=np.nan))
    ok = np.isfinite(dxy)
    assert np.abs(dxy - 0.01)[ok].max() < 2e-3


def test_rectangular_window_and_derivy():
    rng = np.random.default_rng(3)
    img = _holed(rng, (48, 136), frac=0.1)
    ys = np.asarray(savgol2d_apply_masked(
        jnp.asarray(img.astype(np.float64)), half_window_x=3,
        half_window_y=2, poly_order=2, deriv_y=1, fill=np.nan,
        method="xla"))
    yf = np.asarray(_fused(img, nx=3, ny=2, m=2, dy=1, fill=np.nan))
    ok = np.isfinite(ys) & np.isfinite(yf)
    assert np.abs(yf - ys)[ok].max() < 1e-4


def test_weighted_fit():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((40, 72)).astype(np.float32)
    wts = rng.random((40, 72)).astype(np.float32)
    wts[rng.random(wts.shape) < 0.2] = 0.0
    ys = np.asarray(savgol2d_apply_masked(
        jnp.asarray(img.astype(np.float64)), half_window_x=2,
        half_window_y=2, poly_order=2, mask=jnp.asarray(
            wts.astype(np.float64)), fill=np.nan, method="xla"))
    yf = np.asarray(_fused(img, nx=2, ny=2, m=2, fill=np.nan,
                           weighted=True, wts=wts))
    ok = np.isfinite(ys) & np.isfinite(yf)
    assert ok.mean() > 0.9
    assert np.abs(yf - ys)[ok].max() < 1e-4


def test_under_quorum_fill_and_big_hole():
    rng = np.random.default_rng(5)
    img = rng.standard_normal((40, 72)).astype(np.float32)
    img[10:30, 20:50] = np.nan            # hole much bigger than a window
    y = np.asarray(_fused(img, nx=2, ny=2, m=2, fill=-7.5))
    assert (y[18:22, 30:40] == -7.5).all()
    assert np.isfinite(y).all()


def test_fused_diff_wrapper_gradients_match_twin():
    # the custom VJP routes backward through the staged twin; grads of
    # the wrapper must equal grads of the twin called directly
    rng = np.random.default_rng(6)
    img = rng.standard_normal((40, 72)).astype(np.float32)
    mask = rng.random((40, 72)) > 0.1
    xz = jnp.asarray(np.where(mask, img, 0.0))
    w = jnp.asarray(mask.astype(np.float32))
    xzp = jnp.pad(xz, ((2, 2), (2, 2)))
    wp = jnp.pad(w, ((2, 2), (2, 2)))

    op = _masked2d_fused_diff(2, 2, 2, 0, 0, 1.0, 1.0, 6, repr(0.0),
                              1e-6, False)
    gx = jax.grad(lambda v: jnp.sum(op(v, wp) ** 2))(xzp)
    assert np.isfinite(np.asarray(gx)).all()
    # directional-derivative consistency with the forward values
    eps = 1e-3
    d = jnp.asarray(np.random.default_rng(7).standard_normal(
        xzp.shape).astype(np.float32))
    f0 = float(jnp.sum(op(xzp, wp) ** 2))
    f1 = float(jnp.sum(op(xzp + eps * d, wp) ** 2))
    fd = (f1 - f0) / eps
    an = float(jnp.vdot(gx, d))
    assert abs(fd - an) < 5e-2 * max(1.0, abs(an))


def test_all_valid_equals_classic():
    # nothing missing: the masked fit must reproduce the classic 2D filter
    from savgol_tpu import Savgol2D, Savgol2DConfig
    rng = np.random.default_rng(8)
    img = rng.standard_normal((40, 72)).astype(np.float32)
    y_classic = np.asarray(Savgol2D.create(
        Savgol2DConfig(2, 2, 2), dtype=jnp.float64).apply(
            jnp.asarray(img.astype(np.float64)), method="xla"))
    yf = np.asarray(_fused(img, nx=2, ny=2, m=2, fill=np.nan))
    # interior only: truncate-vs-boundary semantics differ at edges
    assert np.abs(yf - y_classic)[2:-2, 2:-2].max() < 5e-5


def test_supported_predicate():
    assert fused2d_supported(5, 5, 3)
    assert fused2d_supported(1, 1, 2)
    assert not fused2d_supported(1, 5, 3)      # x-degree 3 on 3 points
    with pytest.raises(ValueError):
        tensor_tables_2d(1, 5, 3)


def test_flagship_m3_small():
    # the flagship order-3 tables (P=10, Kp=55) in one small interpret run
    rng = np.random.default_rng(9)
    img = _holed(rng, (40, 136), frac=0.1)
    ys = np.asarray(savgol2d_apply_masked(
        jnp.asarray(img.astype(np.float64)), half_window_x=5,
        half_window_y=5, poly_order=3, fill=np.nan, method="xla"))
    yf = np.asarray(_fused(img, nx=5, ny=5, m=3, fill=np.nan))
    ok = np.isfinite(ys) & np.isfinite(yf)
    assert ok.mean() > 0.9
    assert np.abs(yf - ys)[ok & _well_covered(img, 5, 5)].max() < 5e-5
    assert np.abs(yf - ys)[ok].max() < 1e-3
