"""2D filter tests — ports of test_savgol2d.c: weight sums (:77-120),
analytic fields (:126-360), convenience gradient/hessian/laplacian
(:362-502), rectangular window (:508-543), plus golden parity vs the
compiled reference and batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg

F64 = jnp.float64


def grid(rows, cols):
    """(row=y, col=x) coordinate fields."""
    y = np.arange(rows, dtype=np.float64)
    x = np.arange(cols, dtype=np.float64)
    return np.meshgrid(x, y)  # X: varies along cols, Y: along rows


class TestAnalyticFields:
    def test_constant_preserved(self):
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        img = jnp.full((30, 40), 5.0, dtype=F64)
        for b in (sg.Boundary2D.VALID, sg.Boundary2D.CONSTANT,
                  sg.Boundary2D.REFLECT, sg.Boundary2D.PERIODIC):
            out = np.asarray(f.apply(img, boundary=b))
            np.testing.assert_allclose(out, 5.0, atol=1e-9)

    def test_linear_preserved(self):
        # 2x + 3y (test_savgol2d.c:153)
        X, Y = grid(30, 40)
        img = jnp.asarray(2 * X + 3 * Y, dtype=F64)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, np.asarray(img)[3:-3, 3:-3],
                                   atol=1e-8)

    def test_ddx_of_5x(self):
        X, Y = grid(25, 35)
        img = jnp.asarray(5 * X, dtype=F64)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_x=1), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 5.0, atol=1e-8)

    def test_ddy_of_7y(self):
        X, Y = grid(25, 35)
        img = jnp.asarray(7 * Y, dtype=F64)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_y=1), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 7.0, atol=1e-8)

    def test_d2dx2_of_x_squared(self):
        X, Y = grid(25, 35)
        img = jnp.asarray(X ** 2, dtype=F64)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_x=2), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 2.0, atol=1e-7)

    def test_d2dy2_of_3y_squared(self):
        X, Y = grid(25, 35)
        img = jnp.asarray(3 * Y ** 2, dtype=F64)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_y=2), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 6.0, atol=1e-7)

    def test_mixed_d2dxdy_of_4xy(self):
        X, Y = grid(25, 35)
        img = jnp.asarray(4 * X * Y, dtype=F64)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_x=1, deriv_y=1), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 4.0, atol=1e-7)

    def test_delta_scaling(self):
        X, Y = grid(25, 35)
        dx = 0.5
        img = jnp.asarray(5 * (X * dx), dtype=F64)  # f(x) = 5x in units of dx
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 3, 2, deriv_x=1, delta_x=dx), dtype=F64)
        out = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(out, 5.0, atol=1e-8)


class TestConvenience:
    def test_gradient(self):
        X, Y = grid(30, 30)
        img = jnp.asarray(2 * X + 3 * Y, dtype=F64)
        gx, gy = sg.savgol2d_gradient(img, 3, 3, 2,
                                      boundary=sg.Boundary2D.VALID)
        np.testing.assert_allclose(np.asarray(gx), 2.0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(gy), 3.0, atol=1e-8)

    def test_gradient_requires_order1(self):
        # order 1 suffices for gradient; hessian requires >= 2
        X, Y = grid(20, 20)
        img = jnp.asarray(X + Y, dtype=F64)
        gx, gy = sg.savgol2d_gradient(img, 2, 2, 1,
                                      boundary=sg.Boundary2D.VALID)
        np.testing.assert_allclose(np.asarray(gx), 1.0, atol=1e-8)

    def test_hessian(self):
        X, Y = grid(30, 30)
        img = jnp.asarray(X ** 2 + 4 * X * Y + 3 * Y ** 2, dtype=F64)
        hxx, hxy, hyy = sg.savgol2d_hessian(img, 3, 3, 2,
                                            boundary=sg.Boundary2D.VALID)
        np.testing.assert_allclose(np.asarray(hxx), 2.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(hxy), 4.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(hyy), 6.0, atol=1e-7)

    def test_hessian_rejects_low_order(self):
        img = jnp.zeros((20, 20), dtype=F64)
        with pytest.raises(ValueError, match="poly_order"):
            sg.savgol2d_hessian(img, 3, 3, 1)

    def test_laplacian(self):
        X, Y = grid(30, 30)
        img = jnp.asarray(X ** 2 + 3 * Y ** 2, dtype=F64)  # lap = 2 + 6
        lap = sg.savgol2d_laplacian(img, 4, 4, 2,
                                    boundary=sg.Boundary2D.VALID)
        np.testing.assert_allclose(np.asarray(lap), 8.0, atol=1e-7)

    def test_laplacian_rejects_low_order(self):
        img = jnp.zeros((20, 20), dtype=F64)
        with pytest.raises(ValueError, match="poly_order"):
            sg.savgol2d_laplacian(img, 3, 3, 1)


class TestRectangularWindow:
    def test_5x3_window(self):
        # test_savgol2d.c:508-543 — hw_x=2 (width 5), hw_y=1 (height 3)
        X, Y = grid(20, 25)
        img = jnp.asarray(2 * X + 3 * Y, dtype=F64)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 1, 2), dtype=F64)
        assert f.weights.shape == (3, 5)
        out = np.asarray(f.apply_valid(img))
        assert out.shape == (20 - 2, 25 - 4)
        np.testing.assert_allclose(out, np.asarray(img)[1:-1, 2:-2],
                                   atol=1e-8)

    def test_valid_size_helper(self):
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 1, 2), dtype=F64)
        assert f.valid_size(20, 25) == (18, 21)


class TestReferenceGoldenParity2D:
    @pytest.mark.parametrize("boundary", ["valid", "constant", "reflect"])
    @pytest.mark.parametrize("dx,dy", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_random_field(self, ref, boundary, dx, dy):
        rng = np.random.default_rng(11)
        img = rng.standard_normal((24, 31)).astype(np.float32)
        order = 3
        theirs = ref.apply2d(img, 3, 2, order, dx, dy, boundary=boundary)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(3, 2, order, deriv_x=dx, deriv_y=dy),
            dtype=F64)
        ours = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                                  boundary=sg.Boundary2D(boundary)))
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(ours - theirs).max() <= 2e-6 * scale


class TestIntegerInput2D:
    """Integer images must be promoted, never the weights/scales cast down
    (review repro: the TPU Pallas paths cast the WEIGHTS to x.dtype,
    truncating fractional stencils to zero; scales had the same bug)."""

    def test_pallas_path_promotes(self):
        img_i = jnp.arange(24 * 24, dtype=jnp.int32).reshape(24, 24) % 7
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)
        y = np.asarray(f.apply(img_i, method="pallas"))
        yx = np.asarray(f.apply(img_i.astype(F64), method="xla"))
        assert y.dtype == np.float64
        np.testing.assert_allclose(y, yx, atol=1e-9)

    def test_gradient_scales_not_truncated(self):
        img_i = jnp.arange(24 * 24, dtype=jnp.int32).reshape(24, 24) % 7
        gx, gy = sg.savgol2d_gradient(img_i, 3, 3, 2,
                                      delta_x=2.0, delta_y=2.0)
        gxf, gyf = sg.savgol2d_gradient(img_i.astype(F64), 3, 3, 2,
                                        delta_x=2.0, delta_y=2.0)
        assert float(jnp.abs(gx - gxf).max()) == 0.0
        assert float(jnp.abs(gy - gyf).max()) == 0.0

    def test_stack_accepts_boundary_string(self):
        img = jnp.asarray(np.random.default_rng(3).standard_normal((24, 24)),
                          dtype=F64)
        got = sg.savgol2d_hessian(img, 3, 3, 2, boundary="reflect")
        want = sg.savgol2d_hessian(img, 3, 3, 2,
                                   boundary=sg.Boundary2D.REFLECT)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBoundaryStrings:
    @pytest.mark.parametrize("name", ["valid", "constant", "reflect",
                                      "periodic"])
    def test_apply_accepts_strings(self, name):
        """apply(boundary=...) coerces the same strings Savgol2DConfig
        does."""
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        img = jnp.asarray(np.random.default_rng(13).standard_normal((24, 24)),
                          dtype=F64)
        a = np.asarray(f.apply(img, boundary=name))
        b = np.asarray(f.apply(img, boundary=sg.Boundary2D(name)))
        np.testing.assert_array_equal(a, b)

    def test_bad_boundary_string_rejected(self):
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        with pytest.raises(ValueError):
            f.apply(jnp.zeros((24, 24), dtype=F64), boundary="wrap")


class TestBatching:
    def test_batched_images(self):
        rng = np.random.default_rng(13)
        imgs = rng.standard_normal((5, 20, 22))
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)
        batched = np.asarray(f.apply(jnp.asarray(imgs, dtype=F64)))
        for b in range(5):
            single = np.asarray(f.apply(jnp.asarray(imgs[b], dtype=F64)))
            np.testing.assert_allclose(batched[b], single, atol=1e-12)


class TestReference2DFuzz:
    def test_random_2d_grid(self, ref):
        """25 random (nx, ny, order, dx, dy, boundary, shape) draws vs the
        compiled reference C 2D path."""
        rng = np.random.default_rng(777)
        trials = 0
        while trials < 25:
            nx = int(rng.integers(1, 9))
            ny = int(rng.integers(1, 9))
            order = int(rng.integers(0, 5))
            if (2 * nx + 1) * (2 * ny + 1) < sg.num_terms_2d(order):
                continue
            dtot = int(rng.integers(0, order + 1))
            dx = int(rng.integers(0, dtot + 1))
            dy = dtot - dx
            boundary = str(rng.choice(["valid", "constant", "reflect"]))
            R = int(rng.integers(2 * ny + 1, 40))
            C = int(rng.integers(2 * nx + 1, 40))
            img = rng.standard_normal((R, C)).astype(np.float32)
            theirs = ref.apply2d(img, nx, ny, order, dx, dy,
                                 boundary=boundary)
            if theirs is None:
                # The reference's pivoting-free Cholesky refused this
                # config. Two legitimate outcomes for us: (a) genuinely
                # degenerate geometry (coincident monomial columns, e.g.
                # ny=1 with order 3) -> we must also raise; (b) merely
                # ill-conditioned -> LAPACK solves it where the reference's
                # fragile solver gave up, and our weights must then satisfy
                # the defining monomial-reproduction property.
                try:
                    f = sg.Savgol2D.create(
                        sg.Savgol2DConfig(nx, ny, order,
                                          deriv_x=dx, deriv_y=dy),
                        dtype=F64)
                except np.linalg.LinAlgError:
                    trials += 1
                    continue
                w = np.asarray(f.weights)
                xs = np.arange(-nx, nx + 1, dtype=np.float64)
                ys = np.arange(-ny, ny + 1, dtype=np.float64)
                X, Y = np.meshgrid(xs, ys)
                import math as _math
                expect = (_math.factorial(dx) * _math.factorial(dy))
                got = float((w * X**dx * Y**dy).sum())
                assert abs(got - expect) < 1e-6 * max(1.0, abs(expect)), (
                    f"robust-solve weights broken for nx={nx} ny={ny} "
                    f"order={order} d=({dx},{dy}): {got} != {expect}")
                trials += 1
                continue
            f = sg.Savgol2D.create(
                sg.Savgol2DConfig(nx, ny, order, deriv_x=dx, deriv_y=dy),
                dtype=F64)
            ours = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                                      boundary=sg.Boundary2D(boundary)))
            scale = max(1.0, np.abs(theirs).max())
            err = np.abs(ours - theirs).max()
            assert err <= 5e-5 * scale, (
                f"nx={nx} ny={ny} o={order} d=({dx},{dy}) {boundary} "
                f"{R}x{C}: err {err:.2e} scale {scale:.2e}")
            trials += 1


class TestConvenienceVsReference:
    """gradient/hessian/laplacian with NON-UNIT deltas vs the compiled
    reference C (src/savgol2d.c:462-618 builds each from per-derivative
    savgol2d_apply with the delta folded into the filter scale) — pins the
    1/delta^d convention against the reference, which the analytic tests
    above pin only against polynomial calculus."""

    DX, DY = 0.5, 2.0

    def _img(self):
        rng = np.random.default_rng(91)
        return rng.standard_normal((37, 53)).astype(np.float32)

    def test_gradient_deltas(self, ref):
        img = self._img()
        gx, gy = sg.savgol2d_gradient(
            jnp.asarray(img, dtype=F64), 3, 4, 2,
            delta_x=self.DX, delta_y=self.DY,
            boundary=sg.Boundary2D.CONSTANT)
        for ours, (dx, dy) in ((gx, (1, 0)), (gy, (0, 1))):
            theirs = ref.apply2d(img, 3, 4, 2, dx, dy,
                                 delta_x=self.DX, delta_y=self.DY,
                                 boundary="constant")
            scale = max(1.0, np.abs(theirs).max())
            assert np.abs(np.asarray(ours) - theirs).max() <= 5e-5 * scale

    def test_hessian_deltas(self, ref):
        img = self._img()
        parts = sg.savgol2d_hessian(
            jnp.asarray(img, dtype=F64), 4, 3, 3,
            delta_x=self.DX, delta_y=self.DY,
            boundary=sg.Boundary2D.REFLECT)
        for ours, (dx, dy) in zip(parts, ((2, 0), (1, 1), (0, 2))):
            theirs = ref.apply2d(img, 4, 3, 3, dx, dy,
                                 delta_x=self.DX, delta_y=self.DY,
                                 boundary="reflect")
            scale = max(1.0, np.abs(theirs).max())
            assert np.abs(np.asarray(ours) - theirs).max() <= 5e-5 * scale

    def test_laplacian_deltas(self, ref):
        img = self._img()
        ours = np.asarray(sg.savgol2d_laplacian(
            jnp.asarray(img, dtype=F64), 3, 3, 2,
            delta_x=self.DX, delta_y=self.DY,
            boundary=sg.Boundary2D.CONSTANT))
        theirs = (ref.apply2d(img, 3, 3, 2, 2, 0, delta_x=self.DX,
                              delta_y=self.DY, boundary="constant")
                  + ref.apply2d(img, 3, 3, 2, 0, 2, delta_x=self.DX,
                                delta_y=self.DY, boundary="constant"))
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(ours - theirs).max() <= 5e-5 * scale


class TestPeriodic2D:
    """Boundary2D.PERIODIC — wrap-around edges for cyclic/angular
    images. An extension beyond the reference's boundary set
    (/root/reference/include/iterative/savgol2d.h:108-112), matching
    the 1D BoundaryMode.PERIODIC."""

    def test_equals_wrap_pad_plus_valid(self):
        rng = np.random.default_rng(60)
        img = jnp.asarray(rng.standard_normal((40, 56)), dtype=F64)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2, deriv_x=1),
                               dtype=F64)
        got = np.asarray(f.apply(img, boundary=sg.Boundary2D.PERIODIC,
                                 method="xla"))
        padded = jnp.asarray(np.pad(np.asarray(img), ((2, 2), (3, 3)),
                                    mode="wrap"), dtype=F64)
        want = np.asarray(f.apply_valid(padded, method="xla"))
        np.testing.assert_allclose(got, want, atol=1e-12)

    @pytest.mark.parametrize("shift", [(1, 1), (7, 13)])
    def test_roll_equivariance(self, shift):
        # With wrap-around boundaries the filter commutes with jnp.roll
        # EXACTLY (same windows, same summation order per output pixel).
        rng = np.random.default_rng(61)
        img = jnp.asarray(rng.standard_normal((32, 48)), dtype=F64)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 3, 2), dtype=F64)
        a = np.asarray(f.apply(jnp.roll(img, shift, axis=(0, 1)),
                               boundary=sg.Boundary2D.PERIODIC,
                               method="xla"))
        b = np.roll(np.asarray(f.apply(img,
                                       boundary=sg.Boundary2D.PERIODIC,
                                       method="xla")), shift, axis=(0, 1))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("method", ["pallas", "bf16"])
    def test_fast_paths_agree(self, method):
        rng = np.random.default_rng(62)
        img = jnp.asarray(rng.standard_normal((64, 72)), dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, boundary="periodic", method=method))
        want = np.asarray(f.apply(img, boundary="periodic", method="xla"))
        tol = 3e-2 if method == "bf16" else 1e-5
        assert np.abs(got - want).max() <= tol * max(
            1.0, np.abs(want).max())

    def test_midband_rowmxu_periodic(self):
        # 11x11 routes the exact path through the row-banded MXU wrapper
        # whose boundary pad is fused — cover its wrap mode too
        rng = np.random.default_rng(63)
        img = jnp.asarray(rng.standard_normal((48, 64)), dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, boundary="periodic"))
        want = np.asarray(f.apply(img, boundary="periodic", method="xla"))
        assert np.abs(got - want).max() <= 1e-5 * max(
            1.0, np.abs(want).max())

    def test_native_engine_periodic_matches_jax(self):
        native = pytest.importorskip("savgol_tpu.native")
        eng = native.HostSavgol2D(sg.Savgol2DConfig(2, 2, 2))
        rng = np.random.default_rng(7)
        img = rng.standard_normal((16, 16)).astype(np.float32)
        got = eng.apply(img, boundary=sg.Boundary2D.PERIODIC)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2),
                               dtype=jnp.float64)
        want = np.asarray(f.apply(jnp.asarray(img, dtype=jnp.float64),
                                  boundary=sg.Boundary2D.PERIODIC))
        assert np.abs(got - want).max() <= 1e-6 * max(
            1.0, np.abs(want).max())


class TestBF16Mode2D:
    """method="bf16": row-banded MXU kernel on bfloat16 operands
    (~3.4x the exact dense rate on v5e at a <=5e-3 relative contract)."""

    def test_valid_bf16_within_contract(self):
        rng = np.random.default_rng(50)
        img = jnp.asarray(rng.standard_normal((200, 300)), dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
        got = np.asarray(f.apply_valid(img, method="bf16"))
        want = np.asarray(f.apply_valid(img, method="xla"))
        assert got.dtype == np.float32
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT])
    def test_same_size_bf16(self, boundary):
        rng = np.random.default_rng(51)
        img = jnp.asarray(rng.standard_normal((150, 150)), dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(4, 4, 2),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, boundary=boundary, method="bf16"))
        want = np.asarray(f.apply(img, boundary=boundary, method="xla"))
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    def test_rowmxu_exact_at_highest(self):
        """The row-banded kernel itself is exact-f32 at HIGHEST — bf16 is
        a precision choice, not a kernel approximation."""
        from savgol_tpu.ops.pallas_conv import correlate2d_valid_pallas_rowmxu
        from savgol_tpu.ops.apply2d import correlate2d_valid
        rng = np.random.default_rng(52)
        img = jnp.asarray(rng.standard_normal((100, 200)), dtype=jnp.float32)
        w = np.asarray(
            sg.Savgol2D.create(sg.Savgol2DConfig(3, 5, 3)).weights,
            dtype=np.float64)
        got = np.asarray(correlate2d_valid_pallas_rowmxu(img, w))
        want = np.asarray(correlate2d_valid(
            img, jnp.asarray(w, dtype=jnp.float32)))
        assert np.abs(got - want).max() <= 2e-5

    def test_bf16_differentiable_via_exact_twin(self):
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2),
                               dtype=jnp.float32)
        img = jnp.asarray(np.arange(64.0 * 64).reshape(64, 64) / 4096,
                          dtype=jnp.float32)
        g = jax.grad(lambda v: jnp.sum(f.apply(v, method="bf16") ** 2))(img)
        g2 = jax.grad(lambda v: jnp.sum(f.apply(v, method="xla") ** 2))(img)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   rtol=3e-2, atol=1e-3)

    def test_same_size_bf16_tiny_image_split_path(self):
        """Images too small for the fused single-pad geometry (pad would
        exceed the dim for symmetric/edge modes) must fall back to the
        split pad path with identical results."""
        rng = np.random.default_rng(54)
        img = jnp.asarray(rng.standard_normal((3, 40, 40)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, boundary=sg.Boundary2D.REFLECT,
                                 method="bf16"))
        want = np.asarray(f.apply(img, boundary=sg.Boundary2D.REFLECT,
                                  method="xla"))
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    def test_bf16_input_stays_bf16(self):
        rng = np.random.default_rng(53)
        img = jnp.asarray(rng.standard_normal((80, 90)), dtype=jnp.bfloat16)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2),
                               dtype=jnp.float32)
        y = f.apply(img, method="bf16")
        assert y.dtype == jnp.bfloat16


def test_gradient_stack_bf16_within_contract():
    """savgol2d_gradient routes through apply_stack's bf16 branch."""
    rng = np.random.default_rng(55)
    img = jnp.asarray(rng.standard_normal((100, 120)), dtype=jnp.float32)
    gx, gy = sg.savgol2d_gradient(img, 4, 4, 2, method="bf16")
    rx, ry = sg.savgol2d_gradient(img, 4, 4, 2, method="xla")
    s = max(np.abs(np.asarray(rx)).max(), np.abs(np.asarray(ry)).max(), 1.0)
    assert np.abs(np.asarray(gx) - np.asarray(rx)).max() <= 3e-2 * s
    assert np.abs(np.asarray(gy) - np.asarray(ry)).max() <= 3e-2 * s


class TestRowmxuExactMidband:
    """Exact-path mid/wide-band dispatch (apply2d._rowmxu_exact_band):
    stencils of >= 11 taps route to the row-banded MXU kernel at HIGHEST
    on TPU. These run the dispatch wrappers in interpret mode on CPU."""

    def test_band_predicate(self, monkeypatch):
        from savgol_tpu.ops import apply2d
        # CPU backend: never routes (interpret-mode rowmxu would be slow)
        assert not apply2d._rowmxu_exact_band(13, 13)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert apply2d._rowmxu_exact_band(11, 11)
        assert apply2d._rowmxu_exact_band(13, 13)
        assert apply2d._rowmxu_exact_band(5, 17)    # rectangular: max()
        assert not apply2d._rowmxu_exact_band(9, 9)  # below the band
        assert not apply2d._rowmxu_exact_band(35, 13)  # > _HALO_R + 1
        assert not apply2d._rowmxu_exact_band(13, 131)  # > _LANES + 1

    def test_same_size_exact_wrapper_matches_xla(self):
        """The fused same-size rowmxu@HIGHEST wrapper the TPU dispatch
        uses for 11+-tap windows, vs the padded XLA HIGHEST twin."""
        from savgol_tpu.ops.apply2d import (_pallas_rowmxu_same_exact_diff,
                                            correlate2d_valid)
        rng = np.random.default_rng(60)
        img = jnp.asarray(rng.standard_normal((2, 70, 90)),
                          dtype=jnp.float32)
        w64 = np.asarray(
            sg.Savgol2D.create(sg.Savgol2DConfig(6, 6, 3)).weights,
            dtype=np.float64)
        w = jnp.asarray(w64, dtype=jnp.float32)
        got = np.asarray(
            _pallas_rowmxu_same_exact_diff("edge", 6, 6)(img, w))
        want = np.asarray(correlate2d_valid(
            jnp.pad(img, ((0, 0), (6, 6), (6, 6)), mode="edge"), w))
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 2e-5 * max(
            1.0, np.abs(want).max())

    def test_valid_exact_wrapper_matches_xla_and_grad(self):
        from savgol_tpu.ops.apply2d import (_pallas_rowmxu_exact_diff,
                                            correlate2d_valid)
        rng = np.random.default_rng(61)
        img = jnp.asarray(rng.standard_normal((60, 80)), dtype=jnp.float32)
        w = jnp.asarray(np.asarray(
            sg.Savgol2D.create(sg.Savgol2DConfig(5, 7, 3)).weights,
            dtype=np.float64), dtype=jnp.float32)
        op = _pallas_rowmxu_exact_diff()
        got = np.asarray(op(img, w))
        want = np.asarray(correlate2d_valid(img, w))
        assert np.abs(got - want).max() <= 2e-5 * max(
            1.0, np.abs(want).max())
        g = jax.grad(lambda v: jnp.sum(op(v, w) ** 2))(img)
        g2 = jax.grad(
            lambda v: jnp.sum(correlate2d_valid(v, w) ** 2))(img)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)

    def test_same_size_exact_wrapper_traced_weights(self):
        """The rowmxu exact wrapper must accept traced weights (the
        dense const-baked kernel cannot) — grad w.r.t. the stencil."""
        from savgol_tpu.ops.apply2d import (_pallas_rowmxu_same_exact_diff,
                                            correlate2d_valid)
        rng = np.random.default_rng(62)
        img = jnp.asarray(rng.standard_normal((50, 60)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((13, 13)) / 169,
                        dtype=jnp.float32)
        op = _pallas_rowmxu_same_exact_diff("symmetric", 6, 6)

        def loss_pallas(wv):
            return jnp.sum(op(img, wv) ** 2)

        def loss_xla(wv):
            xp = jnp.pad(img, ((6, 6), (6, 6)), mode="symmetric")
            return jnp.sum(correlate2d_valid(xp, wv) ** 2)

        gw = jax.grad(loss_pallas)(w)
        gw2 = jax.grad(loss_xla)(w)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-3)

    def test_stack_exact_rowmxu_one_pass(self):
        """The stacked rowmxu@HIGHEST wrapper (building block; dispatch
        uses per-stencil launches — see savgol2d_apply_stack)."""
        from savgol_tpu.ops.apply2d import (_pallas_rowmxu_stack_exact_diff,
                                            _stencil_stack,
                                            correlate2d_valid)
        rng = np.random.default_rng(64)
        img = jnp.asarray(rng.standard_normal((60, 80)), dtype=jnp.float32)
        W, _ = _stencil_stack(6, 6, 3, [(2, 0), (1, 1), (0, 2)], 1.0, 1.0)
        ws = jnp.asarray(W, dtype=jnp.float32)
        op = _pallas_rowmxu_stack_exact_diff()
        got = np.asarray(op(img, ws))
        want = np.asarray(correlate2d_valid(img, ws))
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 2e-5 * max(
            1.0, np.abs(want).max())
        g = jax.grad(lambda v: jnp.sum(op(v, ws) ** 2))(img)
        g2 = jax.grad(
            lambda v: jnp.sum(correlate2d_valid(v, ws) ** 2))(img)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)

    def test_fold_wscale(self):
        from savgol_tpu.ops.apply2d import _fold_wscale
        w = jnp.ones((3, 3), dtype=jnp.float64)
        out = _fold_wscale(w, 1.0, jnp.float32)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), 1.0)
        out2 = _fold_wscale(w, 2.5, jnp.float32)
        np.testing.assert_allclose(np.asarray(out2), 2.5)
        # traced scale: must not crash, folds on device
        f = jax.jit(lambda s: _fold_wscale(w, s, jnp.float32))
        np.testing.assert_allclose(np.asarray(f(jnp.float32(3.0))), 3.0)


def test_rowmxu_out_dtype_f32():
    """bf16 throughput kernels can emit their f32 accumulator directly
    (out_dtype=f32) — same values as the bf16-out + cast form up to the
    final rounding, one fewer full-output pass on the wrapper."""
    from savgol_tpu.ops.pallas_conv import (
        correlate2d_valid_pallas_rowmxu, savgol2d_same_pallas_rowmxu)
    rng = np.random.default_rng(63)
    img = jnp.asarray(rng.standard_normal((40, 150)), dtype=jnp.bfloat16)
    w = jnp.asarray(np.asarray(
        sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3)).weights,
        dtype=np.float64), dtype=jnp.float32)
    y32 = correlate2d_valid_pallas_rowmxu(
        img, w, mxu_precision=jax.lax.Precision.DEFAULT,
        out_dtype=jnp.float32)
    ybf = correlate2d_valid_pallas_rowmxu(
        img, w, mxu_precision=jax.lax.Precision.DEFAULT)
    assert y32.dtype == jnp.float32
    assert ybf.dtype == jnp.bfloat16
    d = np.abs(np.asarray(y32, dtype=np.float64)
               - np.asarray(ybf, dtype=np.float64))
    assert d.max() <= 1e-2  # bf16 final-rounding difference only

    ys = savgol2d_same_pallas_rowmxu(
        img, w, "edge", mxu_precision=jax.lax.Precision.DEFAULT,
        out_dtype=jnp.float32)
    assert ys.dtype == jnp.float32
    assert ys.shape == img.shape


def test_gradient_complex_input():
    rng = np.random.default_rng(56)
    img = jnp.asarray(rng.standard_normal((60, 70))
                      + 1j * rng.standard_normal((60, 70)),
                      dtype=jnp.complex64)
    gx, gy = sg.savgol2d_gradient(img, 3, 3, 2)
    rx, _ = sg.savgol2d_gradient(img.real.astype(jnp.float32), 3, 3, 2)
    assert gx.dtype == jnp.complex64
    np.testing.assert_allclose(np.asarray(gx).real, np.asarray(rx),
                               atol=1e-5)


_POLY2D_CASES = []
_prng2d = np.random.default_rng(0xF02A)
while len(_POLY2D_CASES) < 10:
    hx = int(_prng2d.integers(1, 9))
    hy = int(_prng2d.integers(1, 9))
    order = int(_prng2d.integers(0, 7))
    if (2 * hx + 1) * (2 * hy + 1) < (order + 1) * (order + 2) // 2:
        continue
    pool = [(dx, dy) for dx in range(order + 1) for dy in range(order + 1)
            if dx + dy <= order]
    dx, dy = pool[int(_prng2d.integers(0, len(pool)))]
    R = int(_prng2d.integers(2 * hy + 1, 60))
    C = int(_prng2d.integers(2 * hx + 1, 60))
    _POLY2D_CASES.append((hx, hy, order, dx, dy, R, C))


class TestPolynomialReproductionFuzz:
    """The defining property against mathematics (cf. the 1D lane in
    test_apply.py): any bivariate polynomial with total degree <= order
    is an exact fixed point of the 2D least-squares fit, so VALID mode
    must return its exact (dx, dy) mixed derivative. Tolerance scales
    with the 1/(h_x^dx h_y^dy) rounding amplification plus the normal-
    equations conditioning at high order; real bugs (wrong monomial
    ordering, swapped axes, off-by-one windows) are O(1)."""

    @pytest.mark.parametrize("hx,hy,order,dx,dy,R,C", _POLY2D_CASES)
    def test_valid_reproduces_polynomial(self, hx, hy, order, dx, dy, R, C):
        h_x, h_y = 4.0 / C, 4.0 / R
        try:
            f = sg.Savgol2D.create(
                sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy,
                                  delta_x=h_x, delta_y=h_y), dtype=F64)
        except np.linalg.LinAlgError:
            return                      # singular geometry: covered elsewhere
        xs = (np.arange(C) - C // 2) * h_x
        ys = (np.arange(R) - R // 2) * h_y
        X, Y = np.meshgrid(xs, ys)
        rng = np.random.default_rng(R * 17 + C)
        img = np.zeros((R, C))
        want = np.zeros((R, C))
        import math
        for i in range(order + 1):
            for j in range(order + 1 - i):
                c = rng.uniform(-1, 1)
                img += c * X ** i * Y ** j
                if i >= dx and j >= dy:
                    fi = math.factorial(i) // math.factorial(i - dx)
                    fj = math.factorial(j) // math.factorial(j - dy)
                    want += c * fi * fj * X ** (i - dx) * Y ** (j - dy)
        got = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                                 boundary=sg.Boundary2D.VALID))
        want_v = want[hy:R - hy, hx:C - hx]
        amp = (1.0 / h_x) ** dx * (1.0 / h_y) ** dy
        tol = 1e-11 * amp * max(1.0, np.abs(want_v).max())
        np.testing.assert_allclose(got, want_v, atol=tol,
                                   err_msg=f"{(hx, hy, order, dx, dy, R, C)}")


class TestSingularGeometry:
    """Rank-deficient window geometries (coincident monomial columns, e.g.
    half_window=1 with order 3: x^3 == x on {-1,0,1}).

    The weights w = A c are invariant across the solution family of a
    CONSISTENT singular system (solutions differ by null vectors of A,
    which A annihilates), so the filter is well-defined whenever the
    target coefficient does not mix into the null space — those configs
    must be ACCEPTED (min-norm pseudo-inverse path) and reproduce
    derivatives exactly. Only targets inside the ambiguity (d/dy when
    y^3 == y) are ill-posed and must raise. The accept/reject boundary is
    adjudicated against exact rational arithmetic
    (test_weights.illposed_2d_exact). The reference has no such check: its
    unpivoted Cholesky luck-factors singular systems
    (/root/reference/src/savgol2d.c:134-175) and returns garbage for the
    ill-posed targets — a documented divergence."""

    ACCEPT = [
        # (hx, hy, order, dx, dy, field, exact derivative value)
        (1, 14, 3, 1, 2, lambda x, y: x * y * y, 2.0),
        (13, 1, 3, 1, 0, lambda x, y: x, 1.0),
        (16, 2, 5, 0, 4, lambda x, y: y ** 4, 24.0),
        (1, 2, 3, 1, 2, lambda x, y: x * y * y, 2.0),
    ]
    REJECT = [
        (8, 1, 3, 0, 1),    # y^3 == y: d/dy not identifiable (the
                            # historical wrong-pseudo-solution case)
        (2, 1, 3, 0, 1),
        (1, 2, 3, 3, 0),    # x^3 == x: the x^3 coefficient itself
        (1, 14, 3, 1, 0),
    ]

    @pytest.mark.parametrize("hx,hy,order,dx,dy,field,want", ACCEPT)
    def test_wellposed_singular_accepted_exact(self, hx, hy, order, dx, dy,
                                               field, want):
        from test_weights import illposed_2d_exact
        assert not illposed_2d_exact(hx, hy, order, dx, dy)
        cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
        f = sg.Savgol2D.create(cfg, dtype=F64)
        R, C = max(4 * hy + 2, 40), max(4 * hx + 2, 40)
        yy, xx = np.mgrid[0:R, 0:C].astype(np.float64)
        img = field(xx - C / 2, yy - R / 2)
        out = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                                 boundary=sg.Boundary2D.VALID))
        np.testing.assert_allclose(out, want, atol=1e-7)

    @pytest.mark.parametrize("hx,hy,order,dx,dy,field,want", ACCEPT)
    def test_wellposed_singular_native_parity(self, hx, hy, order, dx, dy,
                                              field, want):
        """The native engine (ridge fallback + A^T w verification) accepts
        the same configs and lands on the same min-norm weights."""
        from savgol_tpu import native
        cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
        w_j = np.asarray(sg.Savgol2D.create(cfg, dtype=F64).weights)
        w_n = native.HostSavgol2D(cfg).weights()
        np.testing.assert_allclose(w_n, w_j, atol=1e-12)

    @pytest.mark.parametrize("hx,hy,order,dx,dy", REJECT)
    def test_illposed_rejected_both_engines(self, hx, hy, order, dx, dy):
        from savgol_tpu import native
        from test_weights import illposed_2d_exact
        assert illposed_2d_exact(hx, hy, order, dx, dy)
        cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
        with pytest.raises(np.linalg.LinAlgError, match="ill-posed"):
            sg.Savgol2D.create(cfg, dtype=F64)
        with pytest.raises(Exception):
            native.HostSavgol2D(cfg)

    def test_ondevice_generator_stays_strict(self):
        """The on-device Cholesky generator cannot take the pseudo-inverse
        route; it rejects ALL rank-deficient geometries with a pointer at
        the host generator."""
        from savgol_tpu.ops.weights import savgol2d_weights
        with pytest.raises(np.linalg.LinAlgError, match="on-device"):
            savgol2d_weights(1, 2, 3, deriv_x=1, deriv_y=2, dtype=jnp.float64)
