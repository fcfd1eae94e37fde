"""Non-uniform-sampling Savitzky-Golay (savgol_apply_nonuniform).

Beyond both the reference (src/savgolFilter.c — uniform-grid weight
tables) and scipy, so the oracles are mathematics itself plus a direct
per-window f64 least-squares fit at the same abscissae, plus the masked
path (which this must reproduce exactly on a uniform grid)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import savgol_tpu as sg
from savgol_tpu import savgol_apply_masked, savgol_apply_nonuniform

F64 = jnp.float64


def oracle_nonuniform(xv, tv, mk, n, m, d, w=None):
    """Per-window LS fit at arbitrary abscissae in f64 (truncate edges)."""
    xv = np.asarray(xv, dtype=np.float64)
    tv = np.asarray(tv, dtype=np.float64)
    mk = np.asarray(mk, dtype=bool)
    N = len(xv)
    out = np.full(N, np.nan)
    for p in range(N):
        js = np.arange(max(0, p - n), min(N, p + n + 1))
        js = js[mk[js]]
        ww = np.ones(len(js)) if w is None else np.asarray(w, float)[js]
        js, ww = js[ww > 0], ww[ww > 0]
        if len(js) < m + 1:
            continue
        u = tv[js] - tv[p]
        A = np.vander(u, m + 1, increasing=True) * np.sqrt(ww)[:, None]
        if np.linalg.matrix_rank(
                A / max(1.0, np.abs(A).max()), tol=1e-10) < m + 1:
            continue
        c, *_ = np.linalg.lstsq(A, xv[js] * np.sqrt(ww), rcond=None)
        out[p] = c[d] * math.factorial(d)
    return out


def jittery_t(rng, N, dt=1.0, jitter=0.35):
    """Strictly increasing, irregular abscissae."""
    gaps = dt * (1.0 + jitter * rng.uniform(-1, 1, N))
    return np.cumsum(gaps) - gaps[0]


class TestUniformGridReduction:
    @pytest.mark.parametrize("n,m,d", [(3, 2, 0), (5, 3, 1), (7, 4, 2)])
    def test_equals_masked_truncate(self, n, m, d):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(201)
        x[rng.choice(201, 25, replace=False)] = np.nan
        dt = 0.5
        t = np.arange(201) * dt
        got = savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d)
        want = savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            derivative=d, time_step=dt, boundary="truncate", solver="qr")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-10)

    def test_interior_equals_classic(self):
        n, m, d = 6, 3, 1
        rng = np.random.default_rng(1)
        x = rng.standard_normal(300)
        t = np.arange(300) * 2.0
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d, time_step=2.0),
                               dtype=F64)
        classic = np.asarray(f.apply(jnp.asarray(x, F64)))
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        np.testing.assert_allclose(got[n:-n], classic[n:-n],
                                   rtol=0, atol=1e-10)


class TestOracleParity:
    @pytest.mark.parametrize("n,m,d", [(2, 1, 0), (4, 2, 1), (5, 3, 2),
                                       (8, 4, 3), (3, 0, 0)])
    def test_irregular_clean(self, n, m, d):
        rng = np.random.default_rng(2 + n)
        N = 157
        t = jittery_t(rng, N, dt=0.8)
        x = rng.standard_normal(N)
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        want = oracle_nonuniform(x, t, np.ones(N, bool), n, m, d)
        assert np.array_equal(np.isnan(got), np.isnan(want))
        fin = ~np.isnan(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=5e-9)

    def test_irregular_with_holes(self):
        n, m, d = 5, 3, 1
        rng = np.random.default_rng(9)
        N = 211
        t = jittery_t(rng, N, dt=1.3)
        x = rng.standard_normal(N)
        x[rng.choice(N, 40, replace=False)] = np.nan
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        want = oracle_nonuniform(x, t, np.isfinite(x), n, m, d)
        assert np.array_equal(np.isnan(got), np.isnan(want))
        fin = ~np.isnan(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=5e-9)

    def test_weighted(self):
        n, m, d = 4, 2, 1
        rng = np.random.default_rng(10)
        N = 120
        t = jittery_t(rng, N)
        x = rng.standard_normal(N)
        w = rng.uniform(0.0, 2.0, N)
        w[w < 0.2] = 0.0                       # some true holes
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d,
            mask=jnp.asarray(w, F64)))
        want = oracle_nonuniform(x, t, np.ones(N, bool), n, m, d, w=w)
        assert np.array_equal(np.isnan(got), np.isnan(want))
        fin = ~np.isnan(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=5e-9)


class TestMathematics:
    @pytest.mark.parametrize("m,d", [(2, 0), (3, 1), (4, 2), (5, 3)])
    def test_polynomial_reproduction_irregular(self, m, d):
        """An order-<=m polynomial sampled at ARBITRARY positions is
        differentiated exactly everywhere, edges included."""
        rng = np.random.default_rng(20 + m)
        n = max(3, m)
        N = 97
        t = np.sort(rng.uniform(0.0, 30.0, N))
        c = rng.standard_normal(m + 1)
        x = sum(ck * t ** k for k, ck in enumerate(c))
        want = sum(ck * math.factorial(k) / math.factorial(k - d)
                   * t ** (k - d)
                   for k, ck in enumerate(c) if k >= d)
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got / scale, np.asarray(want) / scale,
                                   rtol=0, atol=5e-8)

    def test_large_offset_abscissae(self):
        """Epoch-like timestamps: the fit uses t-differences, so a huge
        common offset must not cost accuracy (f64 positions)."""
        n, m, d = 5, 2, 1
        rng = np.random.default_rng(33)
        N = 150
        t = 1.6e9 + jittery_t(rng, N, dt=0.01)
        x = np.sin(2 * np.pi * (t - 1.6e9))
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        want = oracle_nonuniform(x, t, np.ones(N, bool), n, m, d)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    def test_order_zero_is_local_mean(self):
        rng = np.random.default_rng(4)
        N, n = 60, 4
        t = jittery_t(rng, N)
        x = rng.standard_normal(N)
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=0))
        p = 30
        np.testing.assert_allclose(got[p], x[p - n:p + n + 1].mean(),
                                   atol=1e-12)


class TestDegeneracyAndFill:
    def test_coincident_positions_unidentifiable(self):
        """All-coincident abscissae cannot identify a slope -> fill; the
        local mean (m=0) stays well-defined."""
        N = 31
        x = np.random.default_rng(5).standard_normal(N)
        t = np.full(N, 7.0)
        got1 = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=3, poly_order=1, derivative=0))
        assert np.isnan(got1).all()
        got0 = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=3, poly_order=0))
        assert np.isfinite(got0).all()
        np.testing.assert_allclose(got0[10], x[7:14].mean(), atol=1e-12)

    def test_min_points_and_fill(self):
        n, m = 4, 2
        N = 51
        rng = np.random.default_rng(6)
        x = rng.standard_normal(N)
        x[10:18] = np.nan                      # starved mid-windows
        t = jittery_t(rng, N)
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, min_points=7, fill=-1.0))
        want = oracle_nonuniform(x, t, np.isfinite(x), n, m, 0)
        # positions the oracle solves with < 7 points must be filled
        for p in range(N):
            js = np.arange(max(0, p - n), min(N, p + n + 1))
            cnt = np.isfinite(x[js]).sum()
            if cnt < 7:
                assert got[p] == -1.0, p
            else:
                np.testing.assert_allclose(got[p], want[p], atol=5e-9)

    def test_invalid_center_position_fills(self):
        """A NaN abscissa at the CENTER means there is nowhere to
        evaluate -> fill there (neighbors with that sample masked still
        solve fine)."""
        n, m = 3, 1
        N = 21
        rng = np.random.default_rng(7)
        x = rng.standard_normal(N)
        t = jittery_t(rng, N)
        t[10] = np.nan
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m))
        assert np.isnan(got[10])
        mk = np.isfinite(t)
        # the oracle evaluates at tv[p]; neutralize the NaN center (p=10 is
        # excluded from the comparison, other windows never read tv[10])
        want = oracle_nonuniform(x, np.where(mk, t, 0.0), mk, n, m, 0)
        fin = ~np.isnan(want) & (np.arange(N) != 10)
        np.testing.assert_allclose(got[fin], want[fin], atol=5e-9)


class TestAPI:
    def test_shared_t_batch_and_axis(self):
        rng = np.random.default_rng(8)
        B, N, n, m = 3, 80, 4, 2
        t = jittery_t(rng, N)
        x = rng.standard_normal((B, N))
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m))
        for b in range(B):
            want = oracle_nonuniform(x[b], t, np.ones(N, bool), n, m, 0)
            np.testing.assert_allclose(got[b], want, atol=5e-9)
        # axis=0 route == transpose
        got0 = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x.T, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, axis=0))
        np.testing.assert_allclose(got0, got.T, atol=1e-12)

    def test_jit_vmap(self):
        rng = np.random.default_rng(12)
        N, n, m = 64, 3, 2
        t = jnp.asarray(jittery_t(rng, N), F64)
        xs = jnp.asarray(rng.standard_normal((4, N)), F64)
        fn = jax.jit(lambda v: savgol_apply_nonuniform(
            v, t, half_window=n, poly_order=m, derivative=1))
        direct = np.asarray(fn(xs))
        vm = np.asarray(jax.vmap(lambda v: savgol_apply_nonuniform(
            v, t, half_window=n, poly_order=m, derivative=1))(xs))
        np.testing.assert_allclose(vm, direct, atol=1e-12)

    def test_grad_flows_in_x_and_t(self):
        rng = np.random.default_rng(13)
        N, n, m = 40, 3, 2
        t = jnp.asarray(jittery_t(rng, N), F64)
        x = jnp.asarray(rng.standard_normal(N), F64)

        def loss_x(v):
            y = savgol_apply_nonuniform(v, t, half_window=n, poly_order=m,
                                        derivative=1)
            return jnp.sum(y ** 2)

        def loss_t(tt):
            y = savgol_apply_nonuniform(x, tt, half_window=n, poly_order=m,
                                        derivative=1)
            return jnp.sum(y ** 2)

        gx = jax.grad(loss_x)(x)
        gt = jax.grad(loss_t)(t)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gt)).all()
        # directional FD check on x
        v = jnp.asarray(rng.standard_normal(N), F64)
        eps = 1e-6
        fd = (loss_x(x + eps * v) - loss_x(x - eps * v)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.vdot(gx, v)), float(fd),
                                   rtol=1e-6)
        fd_t = (loss_t(t + eps * v) - loss_t(t - eps * v)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.vdot(gt, v)), float(fd_t),
                                   rtol=1e-5)

    def test_f32_path(self):
        rng = np.random.default_rng(14)
        N, n, m = 90, 4, 2
        t = jittery_t(rng, N)
        x = rng.standard_normal(N)
        got = np.asarray(savgol_apply_nonuniform(
            jnp.asarray(x, jnp.float32), jnp.asarray(t, jnp.float32),
            half_window=n, poly_order=m, derivative=1))
        want = oracle_nonuniform(x, t, np.ones(N, bool), n, m, 1)
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 5e-5

    def test_errors(self):
        x = jnp.zeros(10)
        t = jnp.arange(10.0)
        with pytest.raises(ValueError, match="half_window"):
            savgol_apply_nonuniform(x, t, half_window=0, poly_order=0)
        with pytest.raises(ValueError, match="poly_order"):
            savgol_apply_nonuniform(x, t, half_window=2, poly_order=5)
        with pytest.raises(ValueError, match="derivative"):
            savgol_apply_nonuniform(x, t, half_window=2, poly_order=1,
                                    derivative=2)
        with pytest.raises(ValueError, match="min_points"):
            savgol_apply_nonuniform(x, t, half_window=2, poly_order=1,
                                    min_points=1)
        with pytest.raises(ValueError, match="t shape"):
            savgol_apply_nonuniform(x, jnp.zeros(9), half_window=2,
                                    poly_order=1)
        with pytest.raises(ValueError, match="mask shape"):
            savgol_apply_nonuniform(x, t, half_window=2, poly_order=1,
                                    mask=jnp.ones(9, bool))
        with pytest.raises(NotImplementedError):
            savgol_apply_nonuniform(x.astype(jnp.complex64), t,
                                    half_window=2, poly_order=1)

    def test_exported(self):
        assert sg.savgol_apply_nonuniform is savgol_apply_nonuniform
