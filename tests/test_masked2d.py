"""Masked / NaN-robust 2D Savitzky-Golay (savgol2d_apply_masked).

Beyond-reference capability (the reference's src/savgol2d.c has no
missing-data story), so the oracles are mathematics and a direct
per-pixel masked least-squares fit in f64:

- all-valid mask + pad boundary == the classic 2D filter path,
- per-pixel parity with numpy lstsq on the valid window samples
  (random masks, truncate + both pad boundaries, mixed partials,
  anisotropic deltas),
- exact reproduction of bivariate polynomials through holes and
  truncated edges,
- per-pixel well-posedness: quorum (min_points) AND numerically
  identifiable geometry — all-valid-on-one-row windows yield fill for
  any y-dependent fit rather than garbage,
- f32 sanity, jit/vmap/grad, validation errors.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.config import Boundary2D, Savgol2DConfig
from savgol_tpu.ops.apply2d import savgol2d_apply
from savgol_tpu.ops.masked import savgol2d_apply_masked
from savgol_tpu.ops.weights import savgol2d_weights_np

F64 = jnp.float64


def oracle_masked2d(img, mk, nx, ny, m, dx, dy, deltax=1.0, deltay=1.0,
                    boundary=None, kmin=None):
    """Per-pixel masked LS fit in f64; boundary=None means truncate.

    Degenerate pixel geometries (rank-deficient design) yield NaN, the
    analytic analog of the implementation's identifiability rule."""
    img = np.asarray(img, dtype=np.float64)
    mk = np.asarray(mk, dtype=bool)
    R, C = img.shape
    P = (m + 1) * (m + 2) // 2
    if kmin is None:
        kmin = P
    if boundary is not None:
        mode = {Boundary2D.REFLECT: "symmetric",
                Boundary2D.CONSTANT: "edge",
                Boundary2D.PERIODIC: "wrap"}[boundary]
        xpad = np.pad(np.where(mk, img, 0.0), ((ny, ny), (nx, nx)),
                      mode=mode)
        mpad = np.pad(mk.astype(float), ((ny, ny), (nx, nx)),
                      mode=mode) > 0.5
    else:
        xpad = np.pad(np.where(mk, img, 0.0), ((ny, ny), (nx, nx)))
        mpad = np.pad(mk, ((ny, ny), (nx, nx)))
    monos = [(i, t - i) for t in range(m + 1) for i in range(t + 1)]
    out = np.full((R, C), np.nan)
    for r in range(R):
        for c in range(C):
            win = mpad[r:r + 2 * ny + 1, c:c + 2 * nx + 1]
            ys, xs = np.nonzero(win)
            if len(ys) < kmin:
                continue
            uy = (ys - ny) * deltay
            ux = (xs - nx) * deltax
            A = np.stack([ux ** i * uy ** j for i, j in monos], axis=1)
            if np.linalg.matrix_rank(A, tol=1e-9 * max(1.0, np.abs(A).max())
                                     ) < P:
                continue
            vals = xpad[r + ys, c + xs]
            coef, *_ = np.linalg.lstsq(A, vals, rcond=None)
            p = monos.index((dx, dy))
            out[r, c] = coef[p] * math.factorial(dx) * math.factorial(dy)
    return out


def holed_img(rng, R, C, frac=0.12):
    img = rng.standard_normal((R, C))
    k = max(1, int(frac * R * C))
    idx = rng.choice(R * C, k, replace=False)
    img.reshape(-1)[idx] = np.nan
    return img


class TestAgainstClassic:
    @pytest.mark.parametrize("boundary", [Boundary2D.REFLECT,
                                          Boundary2D.CONSTANT,
                                          Boundary2D.PERIODIC])
    @pytest.mark.parametrize("nx,ny,m,dx,dy", [
        (3, 3, 2, 0, 0), (4, 3, 3, 1, 0), (3, 4, 3, 0, 1), (4, 4, 4, 1, 1),
    ])
    def test_all_valid_equals_classic(self, boundary, nx, ny, m, dx, dy):
        rng = np.random.default_rng(7)
        img = rng.standard_normal((48, 56))
        cfg = Savgol2DConfig(nx, ny, m, deriv_x=dx, deriv_y=dy,
                             delta_x=0.5, delta_y=2.0)
        w = savgol2d_weights_np(cfg, dtype=np.float64)
        ref = savgol2d_apply(jnp.asarray(img, F64), jnp.asarray(w, F64),
                             boundary=boundary, scale=cfg.scale)
        got = savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=dx, deriv_y=dy, delta_x=0.5, delta_y=2.0,
            boundary=boundary)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-10)


class TestOracleParity:
    @pytest.mark.parametrize("nx,ny,m,dx,dy,deltax,deltay", [
        (2, 2, 2, 0, 0, 1.0, 1.0),
        (3, 2, 3, 1, 0, 0.5, 1.0),
        (2, 3, 3, 0, 2, 1.0, 2.0),
        (3, 3, 4, 1, 1, 0.25, 0.5),
    ])
    def test_truncate(self, nx, ny, m, dx, dy, deltax, deltay):
        rng = np.random.default_rng(nx * 100 + ny * 10 + m)
        img = holed_img(rng, 28, 26)
        mk = np.isfinite(img)
        want = oracle_masked2d(img, mk, nx, ny, m, dx, dy, deltax, deltay)
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=dx, deriv_y=dy,
            delta_x=deltax, delta_y=deltay))
        fin = np.isfinite(want) & np.isfinite(got)
        # the two well-posedness tests (matrix_rank vs scaled Cholesky)
        # may disagree only on near-degenerate pixels
        assert fin.sum() > 0.9 * np.isfinite(want).sum()
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-7,
                                   atol=1e-8)

    @pytest.mark.parametrize("boundary", [Boundary2D.REFLECT,
                                          Boundary2D.CONSTANT])
    def test_pad_boundaries(self, boundary):
        rng = np.random.default_rng(19)
        nx = ny = 3
        m = 3
        img = holed_img(rng, 24, 24)
        mk = np.isfinite(img)
        want = oracle_masked2d(img, mk, nx, ny, m, 1, 0, boundary=boundary)
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=1, boundary=boundary))
        fin = np.isfinite(want) & np.isfinite(got)
        assert fin.sum() > 0.9 * np.isfinite(want).sum()
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-7,
                                   atol=1e-8)

    def test_explicit_mask(self):
        rng = np.random.default_rng(23)
        nx = ny = 2
        m = 2
        img = rng.standard_normal((20, 20))
        mk = rng.random((20, 20)) > 0.25
        want = oracle_masked2d(img, mk, nx, ny, m, 0, 0)
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, mask=jnp.asarray(mk)))
        fin = np.isfinite(want) & np.isfinite(got)
        assert fin.sum() > 0.9 * np.isfinite(want).sum()
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-8,
                                   atol=1e-10)


class TestMathematics:
    @pytest.mark.parametrize("dx,dy", [(0, 0), (1, 0), (0, 1), (1, 1),
                                       (2, 0)])
    def test_polynomial_reproduction_through_holes(self, dx, dy):
        # an order-m bivariate polynomial with holes is reproduced EXACTLY
        # wherever the masked fit is well-posed
        rng = np.random.default_rng(dx * 10 + dy)
        m = 3
        R, C, nx, ny = 40, 44, 4, 4
        deltax, deltay = 0.5, 0.25
        ux = np.arange(C) * deltax
        uy = np.arange(R)[:, None] * deltay
        monos = [(i, t - i) for t in range(m + 1) for i in range(t + 1)]
        coefs = rng.standard_normal(len(monos))
        img = sum(c * ux ** i * uy ** j for c, (i, j) in zip(coefs, monos))
        exact = sum(
            c * (math.factorial(i) // math.factorial(i - dx))
            * (math.factorial(j) // math.factorial(j - dy))
            * ux ** (i - dx) * uy ** (j - dy)
            for c, (i, j) in zip(coefs, monos) if i >= dx and j >= dy)
        exact = np.broadcast_to(exact, (R, C))
        img.reshape(-1)[rng.choice(R * C, 150, replace=False)] = np.nan
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=dx, deriv_y=dy,
            delta_x=deltax, delta_y=deltay))
        assert np.isfinite(got).all()
        scale = max(1.0, np.max(np.abs(exact)))
        np.testing.assert_allclose(got, exact, rtol=1e-6,
                                   atol=1e-8 * scale)

    def test_degenerate_geometry_fills(self):
        # valid pixels confined to ONE row: enough points for quorum, but
        # any y-dependence is unidentifiable -> fill, not garbage
        nx = ny = 3
        img = np.full((20, 20), np.nan)
        img[10, :] = np.linspace(0.0, 1.0, 20)
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=2, min_points=6))
        assert np.isnan(got).all()
        # the same data with a y-spread IS identifiable
        img[8, :] = 0.5
        img[12, :] = 0.25
        got2 = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=2, min_points=6))
        assert np.isfinite(got2[10, 5:15]).all()

    def test_min_points_and_fill(self):
        rng = np.random.default_rng(5)
        nx = ny = 2
        img = holed_img(rng, 24, 24, frac=0.5)
        strict = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=1, min_points=20, fill=-7.0))
        counts = np.zeros((24, 24))
        mk = np.pad(np.isfinite(img).astype(float), 2)
        for r in range(24):
            for c in range(24):
                counts[r, c] = mk[r:r + 5, c:c + 5].sum()
        np.testing.assert_array_equal(strict == -7.0, counts < 20)
        assert np.isfinite(strict).all()

    def test_order_zero_is_masked_mean(self):
        rng = np.random.default_rng(9)
        img = holed_img(rng, 16, 18)
        nx = ny = 2
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=0))
        mk = np.isfinite(img)
        xs = np.pad(np.where(mk, img, 0.0), 2)
        ms = np.pad(mk.astype(float), 2)
        for r in range(16):
            for c in range(18):
                cnt = ms[r:r + 5, c:c + 5].sum()
                if cnt >= 1:
                    assert abs(got[r, c]
                               - xs[r:r + 5, c:c + 5].sum() / cnt) < 1e-12
                else:
                    assert np.isnan(got[r, c])


class TestTransformsAndDtypes:
    def test_f32_sanity(self):
        rng = np.random.default_rng(31)
        img = holed_img(rng, 40, 40)
        kw = dict(half_window_x=3, half_window_y=3, poly_order=2,
                  deriv_x=1)
        want = np.asarray(savgol2d_apply_masked(jnp.asarray(img, F64), **kw))
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, jnp.float32), **kw))
        fin = np.isfinite(want) & np.isfinite(got)
        assert fin.sum() > 0.98 * np.isfinite(want).sum()
        scale = np.max(np.abs(want[fin]))
        assert np.max(np.abs(got[fin] - want[fin])) / scale < 2e-3

    def test_jit_vmap_batch(self):
        rng = np.random.default_rng(41)
        imgs = np.stack([holed_img(rng, 20, 22) for _ in range(3)])
        f = jax.jit(lambda v: savgol2d_apply_masked(
            v, half_window_x=2, half_window_y=2, poly_order=2))
        batched = np.asarray(f(jnp.asarray(imgs, F64)))
        rows = np.stack([np.asarray(savgol2d_apply_masked(
            jnp.asarray(i, F64), half_window_x=2, half_window_y=2,
            poly_order=2)) for i in imgs])
        fin = np.isfinite(rows)
        assert np.array_equal(fin, np.isfinite(batched))
        np.testing.assert_allclose(batched[fin], rows[fin],
                                   rtol=0, atol=1e-12)
        vm = np.asarray(jax.vmap(lambda v: savgol2d_apply_masked(
            v, half_window_x=2, half_window_y=2, poly_order=2))(
            jnp.asarray(imgs, F64)))
        np.testing.assert_allclose(vm[fin], rows[fin], rtol=0, atol=1e-12)

    def test_grad_flows(self):
        rng = np.random.default_rng(43)
        img = rng.standard_normal((16, 16))
        mk = rng.random((16, 16)) > 0.2

        def loss(v):
            y = savgol2d_apply_masked(
                v, half_window_x=2, half_window_y=2, poly_order=2,
                mask=jnp.asarray(mk), fill=0.0)
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(jnp.asarray(img, F64))
        assert np.isfinite(np.asarray(g)).all()
        assert np.allclose(np.asarray(g)[~mk], 0.0)
        i, j = 8, 8
        assert mk[i, j]
        eps = 1e-6
        xp = img.copy(); xp[i, j] += eps
        xm = img.copy(); xm[i, j] -= eps
        fd = (loss(jnp.asarray(xp, F64)) - loss(jnp.asarray(xm, F64))) / (
            2 * eps)
        assert abs(float(g[i, j]) - float(fd)) < 1e-5 * max(1.0,
                                                            abs(float(fd)))


class TestValidation:
    def test_errors(self):
        img = jnp.zeros((16, 16))
        with pytest.raises(ValueError, match="half_window_x"):
            savgol2d_apply_masked(img, half_window_x=0, half_window_y=2,
                                  poly_order=1)
        with pytest.raises(ValueError, match="deriv"):
            savgol2d_apply_masked(img, half_window_x=2, half_window_y=2,
                                  poly_order=1, deriv_x=1, deriv_y=1)
        with pytest.raises(ValueError, match="min_points"):
            savgol2d_apply_masked(img, half_window_x=2, half_window_y=2,
                                  poly_order=2, min_points=3)
        with pytest.raises(ValueError, match="valid"):
            savgol2d_apply_masked(img, half_window_x=2, half_window_y=2,
                                  poly_order=1, boundary=Boundary2D.VALID)
        with pytest.raises(ValueError, match="mask shape"):
            savgol2d_apply_masked(img, half_window_x=2, half_window_y=2,
                                  poly_order=1, mask=jnp.ones((16, 15),
                                                              bool))
        with pytest.raises(ValueError, match="2D"):
            savgol2d_apply_masked(jnp.zeros(16), half_window_x=2,
                                  half_window_y=2, poly_order=1)

    def test_exported(self):
        assert sg.savgol2d_apply_masked is savgol2d_apply_masked


class TestWeighted2D:
    def test_weighted_oracle_parity(self):
        rng = np.random.default_rng(61)
        nx = ny = 2
        m = 2
        img = rng.standard_normal((22, 24))
        w = rng.random((22, 24))
        w[rng.random((22, 24)) < 0.2] = 0.0
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=1, mask=jnp.asarray(w, F64)))
        # direct per-pixel weighted lstsq
        monos = [(i, t - i) for t in range(m + 1) for i in range(t + 1)]
        xpad = np.pad(np.where(w > 0, img, 0.0), ((ny, ny), (nx, nx)))
        wpad = np.pad(w, ((ny, ny), (nx, nx)))
        want = np.full_like(img, np.nan)
        for r in range(22):
            for c in range(24):
                ww = wpad[r:r + 2 * ny + 1, c:c + 2 * nx + 1]
                ys, xs = np.nonzero(ww > 0)
                if len(ys) < len(monos):
                    continue
                uy, ux = (ys - ny) * 1.0, (xs - nx) * 1.0
                A = np.stack([ux ** i * uy ** j for i, j in monos], axis=1)
                sw = np.sqrt(ww[ys, xs])
                if np.linalg.matrix_rank(A * sw[:, None]) < len(monos):
                    continue
                coef, *_ = np.linalg.lstsq(
                    A * sw[:, None], xpad[r + ys, c + xs] * sw, rcond=None)
                want[r, c] = coef[monos.index((1, 0))]
        fin = np.isfinite(want) & np.isfinite(got)
        assert fin.sum() > 0.9 * np.isfinite(want).sum()
        np.testing.assert_allclose(got[fin], want[fin], rtol=1e-7,
                                   atol=1e-8)

    def test_uniform_weights_equal_bool_mask(self):
        rng = np.random.default_rng(63)
        img = holed_img(rng, 20, 20)
        mk = np.isfinite(img)
        base = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=2, half_window_y=2,
            poly_order=2, mask=jnp.asarray(mk)))
        wtd = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=2, half_window_y=2,
            poly_order=2, mask=jnp.asarray(mk.astype(np.float64) * 3.0)))
        fin = np.isfinite(base)
        assert np.array_equal(fin, np.isfinite(wtd))
        np.testing.assert_allclose(wtd[fin], base[fin], rtol=0, atol=1e-10)

    def test_weighted_polynomial_reproduction(self):
        rng = np.random.default_rng(65)
        ux = np.arange(30) * 1.0
        uy = np.arange(28)[:, None] * 1.0
        img = 2.0 + ux - 0.5 * uy + 0.25 * ux * uy
        w = rng.random((28, 30)) * 4
        got = np.asarray(savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=3, half_window_y=3,
            poly_order=2, deriv_x=1, deriv_y=1, mask=jnp.asarray(w, F64)))
        np.testing.assert_allclose(got, 0.25, rtol=0, atol=1e-10)
