"""Weight-generation tests: algebraic properties (ports of
test_savgol.c:91-140), scipy parity, exact-rational parity for extreme
configs, reference-C parity, and host/device agreement."""

import math
from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import savgol_coeffs

import savgol_tpu as sg
from savgol_tpu.ops.weights import (genfact, savgol2d_weights,
                                    savgol2d_weights_np, savgol_weights,
                                    savgol_weights_np)

GRID = [(2, 2, 0), (5, 3, 0), (12, 4, 0), (5, 3, 1), (12, 4, 1),
        (8, 4, 2), (12, 4, 2), (6, 4, 3), (8, 6, 4), (1, 1, 0),
        (32, 4, 0), (16, 10, 2)]


def exact_weights(n, m, d, t):
    """Exact least-squares weights via rational arithmetic (independent
    oracle: Vandermonde normal equations over Fractions)."""
    pts = list(range(-n, n + 1))
    A = [[Fraction(i) ** k for k in range(m + 1)] for i in pts]
    G = [[sum(A[r][i] * A[r][j] for r in range(len(pts)))
          for j in range(m + 1)] for i in range(m + 1)]
    c = [Fraction(0)] * (m + 1)
    for k in range(d, m + 1):
        fac = Fraction(math.factorial(k), math.factorial(k - d))
        c[k] = fac * (Fraction(t) ** (k - d))
    M = [row[:] + [c[i]] for i, row in enumerate(G)]
    sz = m + 1
    for col in range(sz):
        piv = max(range(col, sz), key=lambda r: abs(M[r][col]))
        M[col], M[piv] = M[piv], M[col]
        for r in range(sz):
            if r != col and M[r][col] != 0:
                f = M[r][col] / M[col][col]
                M[r] = [a - f * b for a, b in zip(M[r], M[col])]
    y = [M[i][sz] / M[i][i] for i in range(sz)]
    return np.array(
        [float(sum(A[r][k] * y[k] for k in range(sz)))
         for r in range(len(pts))])


def illposed_2d_exact(nx, ny, order, dx, dy):
    """Exact-rational adjudicator for the 2D accept/reject boundary.

    True iff the coefficient of x^dx y^dy is NOT identifiable on the
    (2ny+1)x(2nx+1) grid at this order: some exact null vector of the
    design matrix has a nonzero component at the target monomial — the
    functional differs across the LS solution family, so no filter
    weights exist. (When every null component at the target is zero the
    weights A c are invariant across solutions and the filter is
    well-defined despite the ambiguous FIT.) Computed over exact
    integers/rationals: the null space of A equals the null space of the
    integer Gram matrix A^T A, extracted by fraction-free RREF."""
    from savgol_tpu.ops.weights import monomial_index

    k = monomial_index(dx, dy)
    nterms = (order + 1) * (order + 2) // 2
    cols = []
    for tot in range(order + 1):
        for j in range(tot + 1):
            i = tot - j
            cols.append((monomial_index(i, j), i, j))
    pts = [(x, y) for y in range(-ny, ny + 1) for x in range(-nx, nx + 1)]
    A = [[0] * nterms for _ in pts]          # exact python ints
    for r, (x, y) in enumerate(pts):
        for idx, i, j in cols:
            A[r][idx] = (x ** i) * (y ** j)
    G = [[sum(A[r][i] * A[r][j] for r in range(len(pts)))
          for j in range(nterms)] for i in range(nterms)]
    # RREF over rationals
    M = [[Fraction(v) for v in row] for row in G]
    pivots = []
    row = 0
    for col in range(nterms):
        piv = next((r for r in range(row, nterms) if M[r][col] != 0), None)
        if piv is None:
            continue
        M[row], M[piv] = M[piv], M[row]
        M[row] = [v / M[row][col] for v in M[row]]
        for r in range(nterms):
            if r != row and M[r][col] != 0:
                f = M[r][col]
                M[r] = [a - f * b for a, b in zip(M[r], M[row])]
        pivots.append(col)
        row += 1
    free = [c for c in range(nterms) if c not in pivots]
    for fc in free:                          # null basis vector per free col
        v = [Fraction(0)] * nterms
        v[fc] = Fraction(1)
        for r, pc in enumerate(pivots):
            v[pc] = -M[r][fc]
        if v[k] != 0:
            return True
    return False


class TestGenFact:
    def test_values(self):
        assert genfact(5, 0) == 1.0
        assert genfact(5, 1) == 5.0
        assert genfact(5, 5) == 120.0
        assert genfact(3, 5) == 0.0
        assert genfact(64, 10) == float(
            math.factorial(64) // math.factorial(54))


class TestWeightProperties:
    """Algebraic invariants (test_savgol.c:91-140)."""

    @pytest.mark.parametrize("n,m", [(2, 2), (5, 3), (12, 4), (32, 10)])
    def test_smoothing_weights_sum_to_one(self, n, m):
        c, e = savgol_weights_np(sg.SavgolConfig(n, m, 0), dtype=np.float64)
        assert abs(c.sum() - 1.0) < 1e-10
        # every edge row is also a projection of a constant -> sums to 1
        np.testing.assert_allclose(e.sum(axis=1), 1.0, atol=1e-10)

    @pytest.mark.parametrize("n,m", [(2, 2), (5, 3), (12, 4)])
    def test_smoothing_weights_symmetric(self, n, m):
        c, _ = savgol_weights_np(sg.SavgolConfig(n, m, 0), dtype=np.float64)
        np.testing.assert_allclose(c, c[::-1], atol=1e-12)

    @pytest.mark.parametrize("n,m", [(5, 3), (12, 4)])
    def test_deriv1_weights_antisymmetric_zero_center(self, n, m):
        c, _ = savgol_weights_np(sg.SavgolConfig(n, m, 1), dtype=np.float64)
        assert abs(c[n]) < 1e-12
        np.testing.assert_allclose(c, -c[::-1], atol=1e-12)

    @pytest.mark.parametrize("n,m,d", GRID)
    def test_deriv_weights_sum_to_zero(self, n, m, d):
        if d == 0:
            pytest.skip("smoothing")
        c, e = savgol_weights_np(sg.SavgolConfig(n, m, d), dtype=np.float64)
        assert abs(c.sum()) < 1e-7
        np.testing.assert_allclose(e.sum(axis=1), 0.0, atol=1e-6)

    @pytest.mark.parametrize("n,m,d", GRID)
    def test_polynomial_reproduction(self, n, m, d):
        """w(., t) applied to samples of x^p must give p!/(p-d)! t^(p-d)
        for every p <= m — the defining property of the LS fit."""
        cfg = sg.SavgolConfig(n, m, d)
        c, e = savgol_weights_np(cfg, dtype=np.float64)
        pts = np.arange(-n, n + 1, dtype=np.float64)
        for p in range(m + 1):
            vals = pts ** p
            # f64 cancellation floor: terms up to |c|*|vals| cancel to ~0
            # center target t=0: d-th derivative of x^p at 0 is p! iff p==d
            expect0 = float(math.factorial(p)) if p == d else 0.0
            tol0 = 1e-11 * float(np.abs(c) @ np.abs(vals)) + 1e-9
            got = float(c @ vals)
            assert abs(got - expect0) < max(tol0, 1e-6 * abs(expect0)), (
                f"p={p}: {got} != {expect0}")
            # edge rows target t = n - epos
            for epos in range(n):
                t = n - epos
                if p < d:
                    expect = 0.0
                else:
                    expect = (math.factorial(p) / math.factorial(p - d)
                              * float(t) ** (p - d))
                tole = 1e-11 * float(np.abs(e[epos]) @ np.abs(vals)) + 1e-9
                gote = float(e[epos] @ vals)
                assert abs(gote - expect) < max(tole, 1e-6 * abs(expect))


class TestScipyParity:
    @pytest.mark.parametrize("n,m,d", [(2, 2, 0), (5, 3, 0), (12, 4, 0),
                                       (5, 3, 1), (12, 4, 1), (8, 4, 2),
                                       (6, 4, 3), (8, 6, 4)])
    def test_center_matches_scipy(self, n, m, d):
        c, _ = savgol_weights_np(sg.SavgolConfig(n, m, d), dtype=np.float64)
        ref = savgol_coeffs(2 * n + 1, m, deriv=d, use="dot")
        np.testing.assert_allclose(c, ref, atol=1e-10)

    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (12, 4, 1), (8, 4, 2)])
    def test_edges_match_scipy(self, n, m, d):
        _, e = savgol_weights_np(sg.SavgolConfig(n, m, d), dtype=np.float64)
        for epos in range(n):
            # edge row epos evaluates the fit at window position 2n - epos
            ref = savgol_coeffs(2 * n + 1, m, deriv=d, pos=2 * n - epos,
                                use="dot")
            np.testing.assert_allclose(e[epos], ref, atol=1e-9)


class TestExactParity:
    @pytest.mark.parametrize("n,m,d", [(32, 10, 4), (32, 10, 0), (16, 8, 3)])
    def test_extreme_configs_match_exact_rational(self, n, m, d):
        """At (32, 10, 4) scipy's lstsq path loses ~6e-2; the Gram
        recurrence stays exact to ~1e-16 — verified against rational
        arithmetic."""
        c, e = savgol_weights_np(sg.SavgolConfig(n, m, d), dtype=np.float64)
        np.testing.assert_allclose(c, exact_weights(n, m, d, 0),
                                   atol=1e-12, rtol=1e-9)
        for epos in (0, n // 2, n - 1):
            np.testing.assert_allclose(
                e[epos], exact_weights(n, m, d, n - epos),
                atol=1e-12, rtol=1e-9)


class TestReferenceParity:
    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (12, 4, 0), (12, 4, 2),
                                       (6, 3, 1), (32, 10, 4)])
    def test_weights_match_reference_c(self, ref, n, m, d):
        """Weight tables extracted from the compiled reference filter
        object agree to f32 resolution (the C computes its Gram recurrence
        in f32; ours is f64 then cast)."""
        c, e = savgol_weights_np(sg.SavgolConfig(n, m, d), dtype=np.float64)
        rc, re_ = ref.weights(n, m, d)
        scale = max(1.0, np.abs(rc).max())
        np.testing.assert_allclose(c, rc, atol=3e-6 * scale)
        escale = max(1.0, np.abs(re_).max())
        np.testing.assert_allclose(e, re_, atol=5e-5 * escale)


class TestDeviceParity:
    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (12, 4, 2)])
    def test_on_device_matches_host(self, n, m, d):
        cfg = sg.SavgolConfig(n, m, d)
        ch, eh = savgol_weights_np(cfg, dtype=np.float64)
        cd, ed = savgol_weights(n, m, d, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(cd), ch, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ed), eh, atol=1e-12)

    def test_on_device_f32_close(self):
        cd, ed = savgol_weights(12, 4, 0, dtype=jnp.float32)
        ch, eh = savgol_weights_np(sg.SavgolConfig(12, 4, 0),
                                   dtype=np.float64)
        np.testing.assert_allclose(np.asarray(cd), ch, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ed), eh, atol=2e-5)


class Test2DWeights:
    def test_smoothing_sums_to_one(self):
        w = savgol2d_weights_np(sg.Savgol2DConfig(3, 3, 2), dtype=np.float64)
        assert abs(w.sum() - 1.0) < 1e-10

    def test_derivative_sums_to_zero(self):
        w = savgol2d_weights_np(
            sg.Savgol2DConfig(3, 3, 2, deriv_x=1), dtype=np.float64)
        assert abs(w.sum()) < 1e-10

    @pytest.mark.parametrize("dx,dy", [(0, 0), (1, 0), (0, 1), (2, 0),
                                       (1, 1), (0, 2)])
    def test_monomial_reproduction(self, dx, dy):
        """Applying the stencil to samples of x^i y^j at the window grid
        must reproduce the exact centered derivative for all i+j <= order."""
        nx, ny, order = 4, 3, 3
        w = savgol2d_weights_np(
            sg.Savgol2DConfig(nx, ny, order, deriv_x=dx, deriv_y=dy),
            dtype=np.float64)
        xs = np.arange(-nx, nx + 1, dtype=np.float64)
        ys = np.arange(-ny, ny + 1, dtype=np.float64)
        X, Y = np.meshgrid(xs, ys)
        for tot in range(order + 1):
            for j in range(tot + 1):
                i = tot - j
                field = X ** i * Y ** j
                got = float((w * field).sum())
                if i == dx and j == dy:
                    expect = math.factorial(dx) * math.factorial(dy)
                else:
                    expect = 0.0
                assert abs(got - expect) < 1e-8, (i, j, got, expect)

    def test_rectangular_window(self):
        w = savgol2d_weights_np(sg.Savgol2DConfig(2, 1, 2), dtype=np.float64)
        assert w.shape == (3, 5)
        assert abs(w.sum() - 1.0) < 1e-10

    def test_reference_parity_2d(self, ref):
        for (dx, dy) in [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1)]:
            cfg = sg.Savgol2DConfig(3, 3, 3, deriv_x=dx, deriv_y=dy)
            w = savgol2d_weights_np(cfg, dtype=np.float64)
            # parity via application to a random field against the C
            rng = np.random.default_rng(7)
            img = rng.standard_normal((9, 9)).astype(np.float32)
            ours = float((w * img[1:8, 1:8]).sum() * cfg.scale)
            theirs = ref.apply2d(img, 3, 3, 3, dx, dy,
                                 boundary="valid")[1, 1]
            assert abs(ours - theirs) < 5e-5

    def test_on_device_matches_host_2d(self):
        cfg = sg.Savgol2DConfig(4, 3, 3, deriv_x=1, deriv_y=1)
        wh = savgol2d_weights_np(cfg, dtype=np.float64)
        wd = savgol2d_weights(4, 3, 3, 1, 1, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(wd), wh, atol=1e-9)


class TestOnDevice2DDegeneracy:
    """The jitted 2D generator must reject singular window geometries at
    trace time instead of silently returning NaN weights (cho_solve on a
    singular normal matrix; host path raises — src/savgol2d.c:144-148)."""

    def test_degenerate_geometry_raises(self):
        with pytest.raises(np.linalg.LinAlgError, match="degenerate"):
            savgol2d_weights(5, 1, 3)

    def test_valid_geometry_still_works(self):
        w = savgol2d_weights(3, 3, 2)
        assert np.isfinite(np.asarray(w)).all()

    def test_large_valid_geometry_not_falsely_rejected(self):
        """(16,16,order 6) is nonsingular but its raw normal matrix spans
        ~1e21 — a raw matrix_rank pre-check misclassified it (review
        finding); the scale-invariant rank test must accept it and the f64
        solve must give exact derivative weights."""
        w = np.asarray(savgol2d_weights(16, 16, 6, 1, 0, dtype=jnp.float64))
        xs = np.arange(-16, 17, dtype=np.float64)
        X, _ = np.meshgrid(xs, xs)
        assert abs(float((w * X).sum()) - 1.0) < 1e-9   # d/dx of f=x

    @pytest.mark.parametrize("nx,ny,order,kw", [
        (8, 1, 3, dict(deriv_y=1)),   # y^3 == y on {-1,0,1}: d/dy mixes
        (2, 2, 5, dict(deriv_x=1)),   # x^5 == 5x^3-4x: d/dx mixes
    ])
    def test_illposed_targets_rejected_on_host(self, nx, ny, order, kw):
        """Targets inside the null-space ambiguity defeat residual checks
        (the review's repro: (8,1,3,dy=1) returned d/dy weights off by 10x
        with residual 4e-14); the host generator must reject them — by the
        null-component test, since an unnormalized residual can hide the
        inconsistency under the huge column scales."""
        from savgol_tpu.ops.weights import savgol2d_weights_np
        cfg = sg.Savgol2DConfig(nx, ny, order, **kw)
        with pytest.raises(np.linalg.LinAlgError, match="ill-posed"):
            savgol2d_weights_np(cfg)

    @pytest.mark.parametrize("nx,ny,order", [(16, 1, 3), (1, 8, 3)])
    def test_wellposed_targets_on_singular_grids_accepted(self, nx, ny,
                                                          order):
        """Smoothing on a rank-deficient grid (y^3 == y) is well-posed —
        the constant coefficient is outside the ambiguity, so the host
        generator serves exact weights via the min-norm pseudo-inverse
        (adjudicated: illposed_2d_exact is False; weights reproduce
        constants and annihilate the window coordinates)."""
        from savgol_tpu.ops.weights import savgol2d_weights_np
        assert not illposed_2d_exact(nx, ny, order, 0, 0)
        w = savgol2d_weights_np(sg.Savgol2DConfig(nx, ny, order),
                                dtype=np.float64)
        assert abs(w.sum() - 1.0) < 1e-12
        xs = np.arange(-nx, nx + 1, dtype=np.float64)
        ys = np.arange(-ny, ny + 1, dtype=np.float64)
        X, Y = np.meshgrid(xs, ys)
        assert abs((w * X).sum()) < 1e-12 and abs((w * Y).sum()) < 1e-12
