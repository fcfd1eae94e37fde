"""Masked / NaN-robust Savitzky-Golay (savgol_tpu.ops.masked).

Beyond-reference capability (the reference, src/savgolFilter.c, has no
missing-data story), so the oracles are mathematics itself plus a direct
per-window masked least-squares fit in f64:

- all-valid mask + pad boundary == the classic filter path,
- per-position parity with an explicit numpy lstsq on the valid window
  samples (random masks, all boundary styles, derivatives, dt),
- exact reproduction of order-<=m polynomials through holes AND truncated
  edges (any m+1 distinct samples determine the fit exactly),
- under-determined windows -> fill, with the min_points knob,
- f32 accuracy, jit/vmap/grad, axis handling, validation errors.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.config import BoundaryMode, SavgolConfig
from savgol_tpu.ops.apply import savgol_apply
from savgol_tpu.ops.masked import savgol_apply_masked
from savgol_tpu.ops.weights import savgol_weights_np

F64 = jnp.float64


def oracle_masked(xv, mk, n, m, d, dt, boundary=None):
    """Per-window masked LS fit in f64; boundary=None means truncate."""
    xv = np.asarray(xv, dtype=np.float64)
    mk = np.asarray(mk, dtype=bool)
    N = len(xv)
    if boundary is not None:
        # savgol_tpu semantics (config.PAD_MODE): REFLECT = edge-duplicating
        # symmetric, CONSTANT = edge replication; pads inherit the validity
        # of their source sample.
        mode = {BoundaryMode.REFLECT: "symmetric",
                BoundaryMode.PERIODIC: "wrap",
                BoundaryMode.CONSTANT: "edge"}[boundary]
        xpad = np.pad(np.where(mk, xv, 0.0), n, mode=mode)
        mpad = np.pad(mk.astype(float), n, mode=mode) > 0.5
    else:
        xpad = np.pad(np.where(mk, xv, 0.0), n)
        mpad = np.pad(mk, n)
    out = np.full(N, np.nan)
    for p in range(N):
        js = np.arange(p, p + 2 * n + 1)
        js = js[mpad[js]]
        if len(js) < m + 1:
            continue
        u = (js - (p + n)) * dt
        A = np.vander(u, m + 1, increasing=True)
        c, *_ = np.linalg.lstsq(A, xpad[js], rcond=None)
        out[p] = c[d] * math.factorial(d)
    return out


def holed(rng, N, frac=0.15):
    x = rng.standard_normal(N)
    k = max(1, int(frac * N))
    idx = rng.choice(N, k, replace=False)
    x[idx] = np.nan
    return x


class TestAgainstClassic:
    @pytest.mark.parametrize("boundary", [BoundaryMode.REFLECT,
                                          BoundaryMode.PERIODIC,
                                          BoundaryMode.CONSTANT])
    @pytest.mark.parametrize("n,m,d", [(4, 2, 0), (6, 3, 1), (8, 4, 2)])
    def test_all_valid_equals_classic(self, boundary, n, m, d):
        rng = np.random.default_rng(11)
        x = rng.standard_normal(257)
        cfg = SavgolConfig(n, m, d, time_step=0.5)
        cw, ew = savgol_weights_np(cfg, dtype=np.float64)
        ref = savgol_apply(jnp.asarray(x, F64), jnp.asarray(cw, F64),
                           jnp.asarray(ew, F64), half_window=n,
                           boundary=boundary, dt_inv=1.0 / cfg.dt_scale,
                           derivative=d)
        got = savgol_apply_masked(jnp.asarray(x, F64), half_window=n,
                                  poly_order=m, derivative=d,
                                  time_step=0.5, boundary=boundary)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-12)

    def test_interior_matches_classic_with_holes_far_away(self):
        # holes only in the first 30 samples must not perturb outputs
        # whose windows never see them
        rng = np.random.default_rng(3)
        n, m = 5, 3
        x = rng.standard_normal(200)
        xh = x.copy()
        xh[rng.choice(30, 8, replace=False)] = np.nan
        cfg = SavgolConfig(n, m, 0)
        cw, ew = savgol_weights_np(cfg, dtype=np.float64)
        ref = savgol_apply(jnp.asarray(x, F64), jnp.asarray(cw, F64),
                           jnp.asarray(ew, F64), half_window=n,
                           boundary=BoundaryMode.REFLECT)
        got = savgol_apply_masked(jnp.asarray(xh, F64), half_window=n,
                                  poly_order=m,
                                  boundary=BoundaryMode.REFLECT)
        np.testing.assert_allclose(np.asarray(got)[40:], np.asarray(ref)[40:],
                                   rtol=0, atol=1e-12)


class TestOracleParity:
    @pytest.mark.parametrize("solver", ["normal", "qr"])
    @pytest.mark.parametrize("n,m,d,dt", [
        (3, 2, 0, 1.0), (6, 3, 1, 0.5), (8, 4, 2, 2.0), (10, 5, 3, 1.0),
        (12, 4, 4, 0.25),
    ])
    def test_truncate(self, n, m, d, dt, solver):
        rng = np.random.default_rng(n * 100 + m * 10 + d)
        x = holed(rng, 300)
        want = oracle_masked(x, np.isfinite(x), n, m, d, dt)
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            derivative=d, time_step=dt, solver=solver))
        assert np.array_equal(np.isfinite(want), np.isfinite(got))
        fin = np.isfinite(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("solver", ["normal", "qr"])
    @pytest.mark.parametrize("boundary", [BoundaryMode.REFLECT,
                                          BoundaryMode.PERIODIC,
                                          BoundaryMode.CONSTANT])
    def test_pad_boundaries(self, boundary, solver):
        rng = np.random.default_rng(17)
        n, m, d = 5, 3, 1
        x = holed(rng, 150)
        want = oracle_masked(x, np.isfinite(x), n, m, d, 1.0, boundary)
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            derivative=d, boundary=boundary, solver=solver))
        assert np.array_equal(np.isfinite(want), np.isfinite(got))
        fin = np.isfinite(want)
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=1e-9)

    def test_explicit_mask_overrides_default(self):
        # mask out finite samples: they must not influence the fit
        rng = np.random.default_rng(23)
        n, m = 4, 2
        x = rng.standard_normal(100)
        mask = rng.random(100) > 0.3
        want = oracle_masked(x, mask, n, m, 0, 1.0)
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            mask=jnp.asarray(mask)))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=1e-9)


class TestMathematics:
    @pytest.mark.parametrize("m,d", [(3, 0), (3, 1), (3, 2), (5, 3)])
    def test_polynomial_reproduction_through_holes(self, m, d):
        # an order-m polynomial with holes is reproduced EXACTLY wherever
        # the window keeps >= m+1 samples — truncated edges included
        rng = np.random.default_rng(m * 10 + d)
        N, n, dt = 220, 8, 0.5
        u = np.arange(N) * dt
        coefs = rng.standard_normal(m + 1)
        x = sum(c * u ** k for k, c in enumerate(coefs))
        exact = sum(c * (math.factorial(k) // math.factorial(k - d))
                    * u ** (k - d)
                    for k, c in enumerate(coefs) if k >= d)
        x[rng.choice(N, 25, replace=False)] = np.nan
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            derivative=d, time_step=dt))
        fin = np.isfinite(got)
        assert fin.all()   # 25/220 holes never starve an n=8 window
        scale = max(1.0, np.max(np.abs(exact)))
        # rtol absorbs conditioning of hole-starved high-order windows
        # (the masked quintic fit amplifies f64 rounding to ~1e-7 rel)
        np.testing.assert_allclose(got, np.asarray(exact, dtype=float),
                                   rtol=1e-6, atol=1e-8 * scale)

    def test_underdetermined_windows_fill(self):
        n, m = 3, 2
        x = np.full(50, np.nan)
        x[::7] = 1.0  # at most 1 valid sample per 7-wide window
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m))
        assert np.isnan(got).all()

    def test_min_points_and_fill(self):
        rng = np.random.default_rng(5)
        n, m = 4, 2
        x = holed(rng, 120, frac=0.4)
        loose = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m))
        strict = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            min_points=7, fill=-123.0))
        # a stricter quorum can only invalidate more positions
        assert (strict == -123.0).sum() >= np.isnan(loose).sum()
        counts = np.convolve(np.isfinite(x).astype(int),
                             np.ones(2 * n + 1, dtype=int), "same")
        np.testing.assert_array_equal(strict == -123.0, counts < 7)
        assert np.isfinite(strict).all()  # fill value, not NaN

    def test_poly_order_zero_is_masked_mean(self):
        rng = np.random.default_rng(9)
        x = holed(rng, 80)
        n = 3
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=0))
        mk = np.isfinite(x)
        xs = np.where(mk, x, 0.0)
        s = np.convolve(xs, np.ones(2 * n + 1), "same")
        c = np.convolve(mk.astype(float), np.ones(2 * n + 1), "same")
        want = np.where(c >= 1, s / np.maximum(c, 1), np.nan)
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        np.testing.assert_allclose(got[fin], want[fin], rtol=0, atol=1e-12)


class TestTransformsAndDtypes:
    def test_f32_accuracy(self):
        # Normal equations lose ~cond(A)^2*eps on hole-starved edge windows
        # (cond ~1e3 here); the qr solver keeps ~cond(A)*eps. Both bounds
        # are asserted; interior well-conditioned windows stay tight on
        # the default path too.
        rng = np.random.default_rng(31)
        n, m, d = 8, 4, 1
        x = holed(rng, 500)
        want = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m, derivative=d))
        fin = np.isfinite(want)
        scale = np.max(np.abs(want[fin]))
        got_qr = np.asarray(savgol_apply_masked(
            jnp.asarray(x, jnp.float32), half_window=n, poly_order=m,
            derivative=d, solver="qr"))
        assert np.array_equal(fin, np.isfinite(got_qr))
        assert np.max(np.abs(got_qr[fin] - want[fin])) / scale < 5e-5
        got_ne = np.asarray(savgol_apply_masked(
            jnp.asarray(x, jnp.float32), half_window=n, poly_order=m,
            derivative=d))
        assert np.array_equal(fin, np.isfinite(got_ne))
        assert np.max(np.abs(got_ne[fin] - want[fin])) / scale < 5e-2
        interior = fin.copy()
        interior[:2 * n] = interior[-2 * n:] = False
        assert (np.max(np.abs(got_ne[interior] - want[interior])) / scale
                < 1e-4)

    def test_jit_vmap_axis(self):
        rng = np.random.default_rng(41)
        xs = np.stack([holed(rng, 96) for _ in range(6)])
        f = jax.jit(lambda v: savgol_apply_masked(
            v, half_window=4, poly_order=2, derivative=1))
        batched = np.asarray(f(jnp.asarray(xs, F64)))
        rows = np.stack([np.asarray(savgol_apply_masked(
            jnp.asarray(r, F64), half_window=4, poly_order=2,
            derivative=1)) for r in xs])
        fin = np.isfinite(rows)
        assert np.array_equal(fin, np.isfinite(batched))
        np.testing.assert_allclose(batched[fin], rows[fin],
                                   rtol=0, atol=1e-12)
        via_axis = np.asarray(savgol_apply_masked(
            jnp.asarray(xs.T, F64), half_window=4, poly_order=2,
            derivative=1, axis=0)).T
        np.testing.assert_allclose(via_axis[fin], rows[fin],
                                   rtol=0, atol=1e-12)
        vm = np.asarray(jax.vmap(lambda v: savgol_apply_masked(
            v, half_window=4, poly_order=2, derivative=1))(
            jnp.asarray(xs, F64)))
        np.testing.assert_allclose(vm[fin], rows[fin], rtol=0, atol=1e-12)

    def test_grad_flows_and_is_finite(self):
        rng = np.random.default_rng(43)
        x = rng.standard_normal(64)
        mask = rng.random(64) > 0.2

        def loss(v):
            y = savgol_apply_masked(v, half_window=4, poly_order=2,
                                    mask=jnp.asarray(mask), fill=0.0)
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(jnp.asarray(x, F64))
        assert np.isfinite(np.asarray(g)).all()
        # masked-out samples cannot influence the loss
        assert np.allclose(np.asarray(g)[~mask], 0.0)
        # finite-difference check on one valid coordinate
        i = int(np.flatnonzero(mask)[5])
        eps = 1e-6
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        fd = (loss(jnp.asarray(xp, F64)) - loss(jnp.asarray(xm, F64))) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))

    def test_short_input_truncate(self):
        # truncate mode accepts N < window size (classic path cannot)
        x = jnp.asarray([1.0, 2.0, 3.0, 4.0], F64)
        got = np.asarray(savgol_apply_masked(x, half_window=5, poly_order=1))
        u = np.arange(4.0)
        want = oracle_masked(np.asarray(x), np.ones(4, bool), 5, 1, 0, 1.0)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
        del u


class TestValidation:
    def test_errors(self):
        x = jnp.zeros(32)
        with pytest.raises(ValueError, match="half_window"):
            savgol_apply_masked(x, half_window=0, poly_order=0)
        with pytest.raises(ValueError, match="poly_order"):
            savgol_apply_masked(x, half_window=2, poly_order=5)
        with pytest.raises(ValueError, match="derivative"):
            savgol_apply_masked(x, half_window=3, poly_order=2, derivative=3)
        with pytest.raises(ValueError, match="time_step"):
            savgol_apply_masked(x, half_window=3, poly_order=2,
                                time_step=0.0)
        with pytest.raises(ValueError, match="min_points"):
            savgol_apply_masked(x, half_window=3, poly_order=2, min_points=2)
        with pytest.raises(ValueError, match="POLYNOMIAL"):
            savgol_apply_masked(x, half_window=3, poly_order=2,
                                boundary=BoundaryMode.POLYNOMIAL)
        with pytest.raises(ValueError, match="mask shape"):
            savgol_apply_masked(x, half_window=3, poly_order=2,
                                mask=jnp.ones(31, bool))
        with pytest.raises(ValueError, match="solver"):
            savgol_apply_masked(x, half_window=3, poly_order=2,
                                solver="svd")
        with pytest.raises(ValueError, match="method"):
            savgol_apply_masked(x, half_window=3, poly_order=2,
                                method="pallas2")

    def test_exported(self):
        assert sg.savgol_apply_masked is savgol_apply_masked


class TestWeighted:
    """Float masks = nonnegative per-sample weights (weighted LS)."""

    @staticmethod
    def oracle_weighted(xv, w, n, m, d, dt=1.0):
        xv = np.asarray(xv, dtype=np.float64)
        w = np.asarray(w, dtype=np.float64)
        N = len(xv)
        xpad = np.pad(np.where(w > 0, xv, 0.0), n)
        wpad = np.pad(w, n)
        out = np.full(N, np.nan)
        for p in range(N):
            js = np.arange(p, p + 2 * n + 1)
            keep = wpad[js] > 0
            js = js[keep]
            if len(js) < m + 1:
                continue
            u = (js - (p + n)) * dt
            A = np.vander(u, m + 1, increasing=True)
            sw = np.sqrt(wpad[js])
            c, *_ = np.linalg.lstsq(A * sw[:, None], xpad[js] * sw,
                                    rcond=None)
            out[p] = c[d] * math.factorial(d)
        return out

    @pytest.mark.parametrize("solver", ["normal", "qr"])
    def test_weighted_oracle_parity(self, solver):
        rng = np.random.default_rng(51)
        n, m, d = 6, 3, 1
        x = rng.standard_normal(200)
        w = rng.random(200)
        w[rng.random(200) < 0.2] = 0.0          # hard holes too
        want = self.oracle_weighted(x, w, n, m, d, 0.5)
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m, derivative=d,
            time_step=0.5, mask=jnp.asarray(w, F64), solver=solver))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-8,
                                   atol=1e-9)

    def test_uniform_weights_equal_bool_mask(self):
        rng = np.random.default_rng(53)
        x = holed(rng, 150)
        mk = np.isfinite(x)
        base = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=5, poly_order=3,
            mask=jnp.asarray(mk)))
        # any uniform positive weight gives the same fit (scale cancels)
        for scale in (1.0, 7.5):
            wtd = np.asarray(savgol_apply_masked(
                jnp.asarray(x, F64), half_window=5, poly_order=3,
                mask=jnp.asarray(mk.astype(np.float64) * scale)))
            fin = np.isfinite(base)
            assert np.array_equal(fin, np.isfinite(wtd))
            np.testing.assert_allclose(wtd[fin], base[fin],
                                       rtol=0, atol=1e-10)

    def test_weighted_polynomial_reproduction(self):
        # ANY positive weights reproduce an order-<=m polynomial exactly
        rng = np.random.default_rng(55)
        n, m, d = 7, 3, 2
        u = np.arange(180) * 0.5
        x = 1.0 - 2 * u + 0.3 * u ** 2 - 0.01 * u ** 3
        exact = 0.6 - 0.06 * u
        w = rng.random(180) * 10
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m, derivative=d,
            time_step=0.5, mask=jnp.asarray(w, F64)))
        scale = max(1.0, np.max(np.abs(exact)))
        np.testing.assert_allclose(got, exact, rtol=0, atol=1e-9 * scale)

    def test_weight_quorum_counts_positive_not_sum(self):
        # tiny weights still COUNT toward the quorum (the fit is scale
        # invariant); the weight SUM must not gate it
        n, m = 3, 1
        x = np.ones(40)
        w = np.full(40, 1e-3)
        got = np.asarray(savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m,
            mask=jnp.asarray(w, F64)))
        np.testing.assert_allclose(got, 1.0, rtol=0, atol=1e-9)

    def test_weighted_grad_flows(self):
        rng = np.random.default_rng(57)
        x = rng.standard_normal(64)
        w = rng.random(64)
        w[::5] = 0.0

        def loss(v):
            y = savgol_apply_masked(v, half_window=4, poly_order=2,
                                    mask=jnp.asarray(w, F64), fill=0.0)
            return jnp.sum(y ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(x, F64)))
        assert np.isfinite(g).all()
        assert np.allclose(g[w == 0.0], 0.0)


class TestMomentDecomposition:
    """The fused 1D kernel's tensor-moment form: every pair stencil
    phi_a*phi_b must expand EXACTLY (f64) in the S = min(2m+1, ws)
    orthonormal grid basis the kernel correlates with — the invariant
    that lets S matmuls replace Kp = (m+1)(m+2)/2 pair correlations
    (ops/pallas_masked.py)."""

    @pytest.mark.parametrize("n,m", [(2, 1), (4, 2), (12, 4), (6, 6),
                                     (5, 8), (16, 10), (3, 5)])
    def test_pair_stencils_expand_exactly(self, n, m):
        from savgol_tpu.ops.masked import _masked_tables
        _, _, pair_w, _ = _masked_tables(n, m)
        ws = 2 * n + 1
        S = min(2 * m + 1, ws)
        t = (np.arange(ws, dtype=np.float64) - n) / max(n, 1)
        V2 = np.vander(t, S, increasing=True)
        Q2, R2 = np.linalg.qr(V2)
        sg_ = np.sign(np.diag(R2)).copy()
        sg_[sg_ == 0] = 1.0
        Q2 = Q2 * sg_
        comb = pair_w @ Q2
        # O(1) coefficients (orthonormal-basis products stay bounded)
        assert np.abs(comb).max() < 10.0
        recon = comb @ Q2.T
        # f64-exact up to the degree-2m Vandermonde QR class — orders of
        # magnitude below the kernel's f32 working precision (the
        # wrapper falls back to direct pair bands above 1e-9)
        np.testing.assert_allclose(recon, pair_w, rtol=0, atol=1e-10)
        # thresholded parity zeros change nothing at f32 resolution
        comb[np.abs(comb) < 1e-12 * np.abs(comb).max()] = 0.0
        np.testing.assert_allclose(comb @ Q2.T, pair_w, rtol=0,
                                   atol=1e-10)

    def test_fused_matches_twin_f32(self):
        """Fused kernel (interpret mode off-TPU) vs the staged jnp twin
        on f32 bench-like data — the moment reconstruction must stay in
        the same error class as direct pair correlation."""
        from savgol_tpu.ops.masked import _masked1d_fused_diff
        rng = np.random.default_rng(99)
        x = rng.standard_normal((4, 600)).astype(np.float32)
        w = (rng.random((4, 600)) > 0.2).astype(np.float32)
        op = _masked1d_fused_diff(12, 4, 0, 5, repr(0.0), 1.0)
        got = np.asarray(op(jnp.asarray(x * w), jnp.asarray(w)))
        assert np.isfinite(got).all()
