"""Pallas kernel tests (interpreter mode on CPU; the same code compiles via
Mosaic on TPU — validated separately on hardware by bench/integration runs).

Each kernel is checked against the XLA reference path across shapes chosen
to hit the halo/blocking edge cases: exact block multiples, stragglers
smaller than one block, windows at the size limits, and the fused-edge
kernel's block-geometry fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply import correlate_valid, savgol_apply
from savgol_tpu.ops.apply2d import correlate2d_valid

F32 = jnp.float32


def rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype=F32)


class TestCorr1D:
    @pytest.mark.parametrize("N", [128, 300, 1024, 1025, 2000, 4096])
    @pytest.mark.parametrize("ws", [3, 25, 65])
    def test_matches_xla(self, N, ws):
        if N < ws:
            pytest.skip("input shorter than window")
        x = rand((3, N))
        w = rand((ws,), seed=1)
        got = np.asarray(pc.correlate_valid_pallas(x, w, interpret=True))
        want = np.asarray(correlate_valid(x, w))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)

    def test_1d_input(self):
        x = rand((500,))
        w = rand((11,), seed=2)
        got = np.asarray(pc.correlate_valid_pallas(x, w, interpret=True))
        assert got.shape == (490,)
        np.testing.assert_allclose(
            got, np.asarray(correlate_valid(x, w)), atol=1e-4)

    def test_odd_batch(self):
        # batch not a multiple of the 8-row tile
        x = rand((5, 640))
        w = rand((9,), seed=3)
        got = np.asarray(pc.correlate_valid_pallas(x, w, interpret=True))
        np.testing.assert_allclose(
            got, np.asarray(correlate_valid(x, w)), atol=1e-4)

    def test_window_too_wide_rejected(self):
        with pytest.raises(ValueError, match="exceeds"):
            pc.correlate_valid_pallas(rand((2, 256)), rand((131,)),
                                      interpret=True)


class TestFusedPolynomial:
    @pytest.mark.parametrize("N,n", [(1024, 12), (1000, 12), (300, 5),
                                     (1037, 32), (70, 32), (4096, 1)])
    @pytest.mark.parametrize("d", [0, 1])
    def test_matches_xla(self, N, n, d):
        m = max(min(4, 2 * n), d)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F32)
        x = rand((2, N))
        lead_sign = -1.0 if d % 2 else 1.0
        got = np.asarray(pc.savgol_polynomial_pallas(
            x, f.center_weights, f.edge_weights, n,
            dt_inv=f.dt_inv, lead_sign=lead_sign, interpret=True))
        want = np.asarray(f.apply(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_fallback_geometry(self):
        """An explicitly inadmissible block width (N % cols in (0, n])
        forces the split fallback; result must still match."""
        n, N = 32, 1025
        assert not pc._cols_ok(N, n, 128)   # residue 1 <= n
        f = sg.Savgol1D.create(sg.SavgolConfig(n, 4), dtype=F32)
        x = rand((2, N))
        got = np.asarray(pc.savgol_polynomial_pallas(
            x, f.center_weights, f.edge_weights, n, cols=128,
            interpret=True))
        want = np.asarray(f.apply(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_auto_geometry_always_admissible(self):
        """_pick_cols finds an admissible width for every N, n in range."""
        for n in (1, 5, 12, 32):
            for N in (2 * n + 1, 129, 777, 1024, 1025, 4097, 100_000,
                      131_073):
                if N < 2 * n + 1:
                    continue
                cols = pc._pick_cols(N, n)
                assert cols is not None and pc._cols_ok(N, n, cols), (N, n)

    def test_via_apply_use_pallas(self):
        """The public use_pallas switch routes through the kernel."""
        f = sg.Savgol1D.create(sg.SavgolConfig(8, 3), dtype=F32)
        x = rand((4, 777))
        got = np.asarray(f.apply(x, use_pallas=True))
        want = np.asarray(f.apply(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_padded_boundary_via_use_pallas(self):
        f = sg.Savgol1D.create(
            sg.SavgolConfig(6, 3, boundary=sg.BoundaryMode.REFLECT),
            dtype=F32)
        x = rand((3, 500))
        got = np.asarray(f.apply(x, use_pallas=True))
        want = np.asarray(f.apply(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_valid_via_use_pallas(self):
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=F32)
        x = rand((3, 500))
        got = np.asarray(f.apply_valid(x, use_pallas=True))
        want = np.asarray(f.apply_valid(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


class TestCorr2D:
    @pytest.mark.parametrize("shape,win", [((64, 100), (11, 11)),
                                           ((40, 40), (7, 5)),
                                           ((200, 300), (33, 33)),
                                           ((128, 512), (3, 3)),
                                           ((33, 33), (33, 33))])
    def test_matches_xla(self, shape, win):
        x = rand((2,) + shape)
        w = rand(win, seed=4)
        got = np.asarray(pc.correlate2d_valid_pallas(x, w, interpret=True))
        want = np.asarray(correlate2d_valid(x, w))
        # tolerance scales with tap count (f32 accumulation order differs)
        taps = win[0] * win[1]
        np.testing.assert_allclose(got, want, atol=3e-6 * taps, rtol=1e-5)

    def test_stencil_too_large_rejected(self):
        with pytest.raises(ValueError, match="halo"):
            pc.correlate2d_valid_pallas(rand((40, 40)), rand((35, 11)),
                                        interpret=True)


class TestPallasDifferentiability:
    def test_grad_through_pallas_poly(self):
        """use_pallas forward is Pallas; backward routes through the XLA
        twin's VJP (the op is linear) — grads must match the XLA path."""
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3, 1), dtype=F32)
        x = rand((2, 300))

        def loss_pl(v):
            return jnp.sum(f.apply(v, use_pallas=True) ** 2)

        def loss_xla(v):
            return jnp.sum(f.apply(v) ** 2)

        g_pl = np.asarray(jax.grad(loss_pl)(x))
        g_xla = np.asarray(jax.grad(loss_xla)(x))
        np.testing.assert_allclose(g_pl, g_xla, atol=1e-3, rtol=1e-4)

    def test_grad_through_pallas_padded(self):
        f = sg.Savgol1D.create(
            sg.SavgolConfig(5, 2, boundary=sg.BoundaryMode.REFLECT),
            dtype=F32)
        x = rand((256,))
        g_pl = np.asarray(jax.grad(
            lambda v: jnp.sum(f.apply(v, use_pallas=True)))(x))
        g_xla = np.asarray(jax.grad(lambda v: jnp.sum(f.apply(v)))(x))
        np.testing.assert_allclose(g_pl, g_xla, atol=1e-4)

    def test_grad_wrt_weights(self):
        """Bilinearity: weight gradients flow too."""
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F32)
        x = rand((200,))

        def loss(cw):
            from savgol_tpu.ops.apply import savgol_apply
            return jnp.sum(savgol_apply(
                x, cw, f.edge_weights, half_window=4, use_pallas=True))

        g = np.asarray(jax.grad(loss)(f.center_weights))
        assert np.isfinite(g).all() and (np.abs(g) > 0).any()


class TestPallas2DIntegration:
    @pytest.mark.parametrize("boundary", [sg.Boundary2D.VALID,
                                          sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT])
    def test_savgol2d_use_pallas(self, boundary):
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(4, 3, 3, deriv_x=1),
                                dtype=F32)
        x = rand((2, 60, 70))
        got = np.asarray(f2.apply(x, boundary=boundary, use_pallas=True))
        want = np.asarray(f2.apply(x, boundary=boundary))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_grad_2d_pallas(self):
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F32)
        x = rand((40, 40))
        g_pl = np.asarray(jax.grad(
            lambda v: jnp.sum(f2.apply(v, use_pallas=True)))(x))
        g_xla = np.asarray(jax.grad(lambda v: jnp.sum(f2.apply(v)))(x))
        np.testing.assert_allclose(g_pl, g_xla, atol=1e-4)

    def test_convenience_2d_pallas(self):
        X, Y = np.meshgrid(np.arange(50.0), np.arange(40.0))
        img = jnp.asarray(2 * X + 3 * Y, dtype=F32)
        gx, gy = sg.savgol2d_gradient(img, 3, 3, 2,
                                      boundary=sg.Boundary2D.VALID,
                                      use_pallas=True)
        np.testing.assert_allclose(np.asarray(gx), 2.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy), 3.0, atol=1e-4)
        lap = sg.savgol2d_laplacian(
            jnp.asarray(X ** 2 + 3 * Y ** 2, dtype=F32), 4, 4, 2,
            boundary=sg.Boundary2D.VALID, use_pallas=True)
        np.testing.assert_allclose(np.asarray(lap), 8.0, atol=2e-3)


class TestTileValidation:
    def test_bad_rows_rejected(self):
        with pytest.raises(ValueError, match="rows"):
            pc.correlate_valid_pallas(rand((8, 256)), rand((5,)), rows=7,
                                      interpret=True)

    def test_bad_cols_rejected(self):
        with pytest.raises(ValueError, match="cols"):
            pc.savgol_polynomial_pallas(
                rand((8, 256)), rand((11,)), rand((5, 11)), 5, cols=100,
                interpret=True)


class TestFusedPolynomialMXU:
    """Banded-MXU fused kernel: three stationary (128,128) band matrices
    per inner block; same fused-edge semantics as the VPU kernel."""

    @pytest.mark.parametrize("N,n", [(2048, 12), (1024, 6), (128, 12),
                                     (640, 32), (300, 4), (4000, 12),
                                     # non-dividing N: zero-pad + slab-halo
                                     # trailing fixup (r = N % cols > n),
                                     # incl. the r = n + 1 boundary
                                     (141, 6), (2061, 12), (1000000, 12),
                                     (777, 32)])
    @pytest.mark.parametrize("d", [0, 1])
    def test_matches_xla(self, N, n, d):
        m = max(min(4, 2 * n), d)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F32)
        x = rand((3, N))
        lead_sign = -1.0 if d % 2 else 1.0
        got = np.asarray(pc.savgol_polynomial_pallas_mxu(
            x, f.center_weights, f.edge_weights, n,
            dt_inv=f.dt_inv, lead_sign=lead_sign, interpret=True))
        want = np.asarray(f.apply(x, method="xla"))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_band_matrices_partition_the_window(self):
        """Every tap lands in exactly one of WL/WC/WR."""
        n = 32
        w = np.arange(1.0, 2 * n + 2)
        WL, WC, WR = pc._band_matrices_np(w, n)
        # reconstruct out[j] = sum_k w[k] x[j+k-n] for a ramp input
        x = np.random.default_rng(0).standard_normal(384)
        j = 150                       # block 1, p = 22
        want = sum(w[k] * x[j + k - n] for k in range(2 * n + 1))
        p = j - 128
        got = (x[0:128] @ WL[:, p] + x[128:256] @ WC[:, p]
               + x[256:384] @ WR[:, p])
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_indivisible_length_falls_back(self):
        """N with no admissible block width routes to the VPU kernel."""
        n = 4
        f = sg.Savgol1D.create(sg.SavgolConfig(n, 2), dtype=F32)
        x = rand((2, 127))
        got = np.asarray(pc.savgol_polynomial_pallas_mxu(
            x, f.center_weights, f.edge_weights, n, dt_inv=f.dt_inv,
            interpret=True))
        np.testing.assert_allclose(got, np.asarray(f.apply(x, method="xla")),
                                   atol=2e-5, rtol=1e-5)

    def test_f64_exact(self):
        jax.config.update("jax_enable_x64", True)
        f = sg.Savgol1D.create(sg.SavgolConfig(8, 3, 1), dtype=jnp.float64)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 512)),
                        dtype=jnp.float64)
        got = np.asarray(pc.savgol_polynomial_pallas_mxu(
            x, f.center_weights, f.edge_weights, 8, dt_inv=f.dt_inv,
            lead_sign=-1.0, interpret=True))
        want = np.asarray(f.apply(x, method="xla"))
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestSeparable2D:
    """SVD rank-decomposed 2D kernel: exact for polynomial stencils."""

    @pytest.mark.parametrize("shape,win", [((2, 256, 256), (5, 5, 3)),
                                           ((1, 100, 200), (3, 2, 2)),
                                           ((2, 67, 130), (16, 16, 4))])
    def test_matches_xla(self, shape, win):
        nx, ny, o = win
        x = rand(shape)
        w = sg.Savgol2D.create(sg.Savgol2DConfig(nx, ny, o),
                               dtype=F32).weights
        got = np.asarray(pc.correlate2d_valid_pallas_sep(
            x, np.asarray(w), interpret=True))
        want = np.asarray(correlate2d_valid(x, w))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_rank_bounded_by_order(self):
        for nx, ny, o in [(5, 5, 3), (10, 8, 4), (16, 16, 4)]:
            w = sg.Savgol2D.create(sg.Savgol2DConfig(nx, ny, o),
                                   dtype=jnp.float64).weights
            u, v = pc._svd_stencil_np(np.asarray(w))
            assert u.shape[0] <= o + 1, (nx, ny, o, u.shape)
            np.testing.assert_allclose(
                (u.T @ v), np.asarray(w), atol=1e-12)

    def test_derivative_stencils(self):
        from savgol_tpu.ops.weights import savgol2d_weights_np
        from savgol_tpu.config import Savgol2DConfig
        x = rand((1, 128, 128), seed=4)
        for dx, dy in [(1, 0), (1, 1), (0, 2)]:
            w = savgol2d_weights_np(
                Savgol2DConfig(5, 5, 3, deriv_x=dx, deriv_y=dy),
                dtype=np.float64).astype(np.float32)
            got = np.asarray(pc.correlate2d_valid_pallas_sep(
                x, w, interpret=True))
            want = np.asarray(correlate2d_valid(x, jnp.asarray(w)))
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


class TestFoldedThinBatch:
    """Thin-batch inputs fold the sample axis into tile rows; results are
    identical to the unfolded path."""

    @pytest.mark.parametrize("B,N", [(1, 20000), (3, 16400), (16, 8217)])
    def test_valid_paths(self, B, N):
        x = rand((B, N), seed=5)
        w = rand((25,), seed=6)
        want = np.asarray(correlate_valid(x, w))
        for fn in (pc.correlate_valid_pallas, pc.correlate_valid_pallas_mxu):
            got = np.asarray(fn(x, w, interpret=True))
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_bank_folded(self):
        x = rand((1, 30000), seed=7)
        wk = rand((4, 17), seed=8)
        got = np.asarray(pc.correlate_valid_bank_pallas(x, wk,
                                                        interpret=True))
        for k in range(4):
            want = np.asarray(correlate_valid(x, wk[k]))
            np.testing.assert_allclose(got[k], want, atol=2e-5, rtol=1e-5)


class TestFusedPadMXU:
    """Boundary pad fused into the banded-MXU kernel: strips spliced into
    the slab's masked zero slots — no padded input copy."""

    @pytest.mark.parametrize("pm", ["symmetric", "wrap", "edge"])
    @pytest.mark.parametrize("N,n", [(512, 6), (300, 4), (1000, 32),
                                     (141, 6), (2048, 12), (512, 1)])
    def test_matches_pad_xla(self, pm, N, n):
        from savgol_tpu.ops.apply import correlate_valid
        m = min(4, 2 * n)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F32)
        x = rand((5, N))
        got = np.asarray(pc.savgol_padded_pallas_mxu(
            x, f.center_weights, pm, n, dt_inv=f.dt_inv, interpret=True))
        xp = jnp.pad(x, ((0, 0), (n, n)), mode=pm)
        want = np.asarray(correlate_valid(xp, f.center_weights)
                          * f.dt_inv)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_api_padded_boundary_grad(self):
        """The fused-pad custom_vjp matches the XLA twin's gradient."""
        from savgol_tpu.ops.apply import _pallas_pad_diff
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F32)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 256)),
                        dtype=F32)
        op = _pallas_pad_diff(4, "symmetric")
        g = jax.grad(lambda v: jnp.sum(op(v, f.center_weights, 1.0) ** 2))(x)
        xla = lambda v: jnp.sum((jnp.vectorize(
            lambda u: u, signature="(n)->(n)")(v) * 0 + f.apply(
            v, boundary=sg.BoundaryMode.REFLECT, method="xla")) ** 2)
        g2 = jax.grad(xla)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   atol=1e-4, rtol=1e-4)


class TestKernelGoldenFuzz:
    """Randomized parity of the forced-Pallas API paths (kernels run in
    interpret mode on CPU) directly against the compiled reference C —
    covers the fused-edge, fused-pad, masked arbitrary-N, and fold code
    paths with awkward geometries in one sweep."""

    def test_pallas_full_apply_vs_reference(self, ref):
        rng = np.random.default_rng(777)
        boundaries = ["polynomial", "reflect", "periodic", "constant"]
        for trial in range(12):
            n = int(rng.integers(1, 33))
            m = int(rng.integers(0, min(2 * n, 10) + 1))
            d = int(rng.integers(0, min(m, 4) + 1))
            b = boundaries[trial % 4]
            # awkward lengths: odd, prime-ish, just above the window
            N = int(rng.integers(2 * n + 1, 700)) | 1
            x = rng.standard_normal(N).astype(np.float32)
            theirs = ref.apply(x, n, m, d, boundary=b)
            f = sg.Savgol1D.create(
                sg.SavgolConfig(n, m, d, boundary=sg.BoundaryMode(b)),
                dtype=F32)
            ours = np.asarray(f.apply(jnp.asarray(x), method="pallas",
                                      reference_edge_sign=True))
            scale = max(1.0, np.abs(theirs).max())
            assert np.abs(ours - theirs).max() <= 2e-5 * scale, (
                n, m, d, b, N)

    def test_pallas_valid_vs_reference(self, ref):
        rng = np.random.default_rng(778)
        for _ in range(6):
            n = int(rng.integers(1, 33))
            m = int(rng.integers(0, min(2 * n, 10) + 1))
            N = int(rng.integers(2 * n + 1, 900))
            x = rng.standard_normal(N).astype(np.float32)
            theirs = ref.apply_valid(x, n, m)
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F32)
            ours = np.asarray(f.apply_valid(jnp.asarray(x),
                                            method="pallas"))
            assert ours.shape == theirs.shape
            scale = max(1.0, np.abs(theirs).max())
            assert np.abs(ours - theirs).max() <= 2e-5 * scale, (n, m, N)

    def test_inadmissible_length_falls_back(self):
        """N = lcm(candidate widths) + 1 admits no block width; the
        wrapper must fall back to pad + valid kernels, same result."""
        from savgol_tpu.ops.apply import correlate_valid
        n, N = 12, 12289
        f = sg.Savgol1D.create(sg.SavgolConfig(n, 4), dtype=F32)
        x = rand((2, N), seed=9)
        got = np.asarray(pc.savgol_padded_pallas_mxu(
            x, f.center_weights, "wrap", n, dt_inv=f.dt_inv,
            interpret=True))
        xp = jnp.pad(x, ((0, 0), (n, n)), mode="wrap")
        want = np.asarray(correlate_valid(xp, f.center_weights) * f.dt_inv)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
