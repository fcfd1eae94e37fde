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


# ---------------------------------------------------------------------------
# savgol_resample: evaluation at arbitrary query positions
# ---------------------------------------------------------------------------

from savgol_tpu import savgol_resample  # noqa: E402


def oracle_resample(xv, tv, tqv, n, m, d, mk=None, w=None):
    """Per-query f64 LS fit over the searchsorted window (clipped)."""
    xv = np.asarray(xv, dtype=np.float64)
    tv = np.asarray(tv, dtype=np.float64)
    N = len(xv)
    ws = 2 * n + 1
    mk = np.ones(N, bool) if mk is None else np.asarray(mk, bool)
    out = np.full(len(tqv), np.nan)
    for qi, q in enumerate(np.asarray(tqv, dtype=np.float64)):
        s0 = int(np.clip(np.searchsorted(tv, q) - n, 0, N - ws))
        js = np.arange(s0, s0 + ws)
        js = js[mk[js]]
        ww = np.ones(len(js)) if w is None else np.asarray(w, float)[js]
        js, ww = js[ww > 0], ww[ww > 0]
        if len(js) < m + 1:
            continue
        u = tv[js] - q
        A = np.vander(u, m + 1, increasing=True) * np.sqrt(ww)[:, None]
        if np.linalg.matrix_rank(
                A / max(1.0, np.abs(A).max()), tol=1e-10) < m + 1:
            continue
        c, *_ = np.linalg.lstsq(A, xv[js] * np.sqrt(ww), rcond=None)
        out[qi] = c[d] * math.factorial(d)
    return out


class TestResample:
    @pytest.mark.parametrize("n,m,d", [(3, 2, 0), (5, 3, 1), (7, 4, 2)])
    def test_oracle_parity_irregular_queries(self, n, m, d):
        rng = np.random.default_rng(40 + n)
        N, Nq = 173, 91
        t = jittery_t(rng, N, dt=0.7)
        x = rng.standard_normal(N)
        tq = np.sort(rng.uniform(t[0] - 1.0, t[-1] + 1.0, Nq))  # incl. extrap
        got = np.asarray(savgol_resample(
            jnp.asarray(x, F64), jnp.asarray(t, F64), jnp.asarray(tq, F64),
            half_window=n, poly_order=m, derivative=d))
        want = oracle_resample(x, t, tq, n, m, d)
        assert np.array_equal(np.isnan(got), np.isnan(want))
        fin = ~np.isnan(want)
        scale = max(1.0, np.abs(want[fin]).max())
        np.testing.assert_allclose(got[fin] / scale, want[fin] / scale,
                                   rtol=0, atol=5e-9)

    def test_uniform_grid_on_grid_queries_equal_classic(self):
        n, m, d = 5, 3, 1
        rng = np.random.default_rng(41)
        N = 240
        x = rng.standard_normal(N)
        t = np.arange(N, dtype=float) * 0.5
        got = np.asarray(savgol_resample(
            jnp.asarray(x, F64), jnp.asarray(t, F64), jnp.asarray(t, F64),
            half_window=n, poly_order=m, derivative=d))
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d, time_step=0.5),
                               dtype=F64)
        classic = np.asarray(f.apply(jnp.asarray(x, F64)))
        np.testing.assert_allclose(got[n:-n], classic[n:-n],
                                   rtol=0, atol=1e-10)

    @pytest.mark.parametrize("m,d", [(2, 0), (3, 1), (4, 2)])
    def test_polynomial_reproduction_at_queries(self, m, d):
        rng = np.random.default_rng(42 + m)
        n = max(3, m)
        N, Nq = 120, 60
        t = np.sort(rng.uniform(0.0, 20.0, N))
        tq = rng.uniform(-0.5, 20.5, Nq)                 # incl. extrapolation
        c = rng.standard_normal(m + 1)
        x = sum(ck * t ** k for k, ck in enumerate(c))
        want = sum(ck * math.factorial(k) / math.factorial(k - d)
                   * tq ** (k - d)
                   for k, ck in enumerate(c) if k >= d)
        got = np.asarray(savgol_resample(
            jnp.asarray(x, F64), jnp.asarray(t, F64), jnp.asarray(tq, F64),
            half_window=n, poly_order=m, derivative=d))
        scale = max(1.0, np.abs(np.asarray(want)).max())
        np.testing.assert_allclose(got / scale, np.asarray(want) / scale,
                                   rtol=0, atol=5e-8)

    def test_holes_and_weights(self):
        n, m = 4, 2
        rng = np.random.default_rng(43)
        N, Nq = 150, 50
        t = jittery_t(rng, N)
        x = rng.standard_normal(N)
        x[rng.choice(N, 30, replace=False)] = np.nan
        tq = np.sort(rng.uniform(t[0], t[-1], Nq))
        got = np.asarray(savgol_resample(
            jnp.asarray(x, F64), jnp.asarray(t, F64), jnp.asarray(tq, F64),
            half_window=n, poly_order=m))
        want = oracle_resample(x, t, tq, n, m, 0, mk=np.isfinite(x))
        assert np.array_equal(np.isnan(got), np.isnan(want))
        fin = ~np.isnan(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=5e-9)
        # float weights
        w = np.where(np.isfinite(x), rng.uniform(0.1, 2.0, N), 0.0)
        gw = np.asarray(savgol_resample(
            jnp.asarray(np.where(np.isfinite(x), x, 0.0), F64),
            jnp.asarray(t, F64), jnp.asarray(tq, F64),
            half_window=n, poly_order=m, mask=jnp.asarray(w, F64)))
        ww = oracle_resample(np.where(np.isfinite(x), x, 0.0), t, tq,
                             n, m, 0, w=w)
        fin = ~np.isnan(ww)
        np.testing.assert_allclose(gw[fin], ww[fin], rtol=0, atol=5e-9)

    def test_batch_shares_t(self):
        rng = np.random.default_rng(44)
        B, N, Nq, n, m = 3, 100, 37, 4, 2
        t = jittery_t(rng, N)
        tq = np.sort(rng.uniform(t[0], t[-1], Nq))
        x = rng.standard_normal((B, N))
        got = np.asarray(savgol_resample(
            jnp.asarray(x, F64), jnp.asarray(t, F64), jnp.asarray(tq, F64),
            half_window=n, poly_order=m))
        assert got.shape == (B, Nq)
        for b in range(B):
            want = oracle_resample(x[b], t, tq, n, m, 0)
            np.testing.assert_allclose(got[b], want, atol=5e-9)

    def test_jit_grad(self):
        rng = np.random.default_rng(45)
        N, Nq, n, m = 80, 25, 3, 2
        t = jnp.asarray(jittery_t(rng, N), F64)
        tq = jnp.asarray(np.sort(rng.uniform(1.0, 70.0, Nq)), F64)
        x = jnp.asarray(rng.standard_normal(N), F64)
        fn = jax.jit(lambda v, q: savgol_resample(
            v, t, q, half_window=n, poly_order=m, derivative=1))
        y = fn(x, tq)
        assert np.isfinite(np.asarray(y)).all()

        def loss(v, q):
            return jnp.sum(fn(v, q) ** 2)

        gx = jax.grad(loss, argnums=0)(x, tq)
        gq = jax.grad(loss, argnums=1)(x, tq)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gq)).all()
        v = jnp.asarray(rng.standard_normal(N), F64)
        eps = 1e-6
        fd = (loss(x + eps * v, tq) - loss(x - eps * v, tq)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.vdot(gx, v)), float(fd),
                                   rtol=1e-6)

    def test_errors(self):
        x = jnp.zeros(30)
        t = jnp.arange(30.0)
        tq = jnp.linspace(0.0, 29.0, 7)
        with pytest.raises(ValueError, match="t must be 1D"):
            savgol_resample(x, jnp.zeros((2, 30)), tq, half_window=2,
                            poly_order=1)
        with pytest.raises(ValueError, match="t_query must be 1D"):
            savgol_resample(x, t, tq.reshape(1, -1), half_window=2,
                            poly_order=1)
        with pytest.raises(ValueError, match="shorter than the window"):
            savgol_resample(jnp.zeros(4), jnp.arange(4.0), tq,
                            half_window=3, poly_order=1)
        with pytest.raises(ValueError, match="1D mask length"):
            savgol_resample(x, t, tq, half_window=2, poly_order=1,
                            mask=jnp.ones(29, bool))

    def test_exported(self):
        assert sg.savgol_resample is savgol_resample
