"""1D apply tests: analytic invariants and noise-RMS (ports of
test_savgol.c:146-239, 300-445), scipy parity, golden parity vs the compiled
reference C, ND/axis batching, and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import savgol_filter

import savgol_tpu as sg

F64 = jnp.float64


def make_filter(n, m, d=0, dt=1.0, boundary=sg.BoundaryMode.POLYNOMIAL,
                dtype=F64):
    return sg.Savgol1D.create(
        sg.SavgolConfig(n, m, d, dt, boundary), dtype=dtype)


class TestAnalyticInvariants:
    def test_constant_preserved(self):
        # test_savgol.c:146-169
        f = make_filter(5, 2)
        x = jnp.full((50,), 42.0, dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), 42.0, atol=1e-10)

    def test_linear_preserved(self):
        # test_savgol.c:171-193
        f = make_filter(5, 2)
        x = jnp.asarray(2.0 * np.arange(50) + 3.0, dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-9)

    def test_first_derivative_of_ramp(self):
        # test_savgol.c:195-215 — d(3x)/dx = 3 everywhere, including edges
        # (the reference only asserts the interior; with the corrected
        # leading-edge sign the invariant holds at the edges too).
        f = make_filter(5, 2, d=1)
        x = jnp.asarray(3.0 * np.arange(50), dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-9)

    _POLY_CASES = []
    _prng = np.random.default_rng(0xF029)
    while len(_POLY_CASES) < 12:
        n = int(_prng.integers(1, 33))
        m = int(_prng.integers(0, min(2 * n, 11)))
        d = int(_prng.integers(0, min(m, 4) + 1))
        q = int(_prng.integers(d, m + 1))           # poly degree <= order
        N = int(_prng.integers(2 * n + 1, 500))
        _POLY_CASES.append((n, m, d, q, N))

    @pytest.mark.parametrize("n,m,d,q,N", _POLY_CASES)
    def test_polynomial_reproduction_fuzz(self, n, m, d, q, N):
        """The defining SG property, against mathematics rather than
        another implementation: any polynomial of degree q <= m is an
        EXACT fixed point of the least-squares fit, so the filter must
        return its exact d-th derivative at every output — including the
        asymmetric POLYNOMIAL edges. Random (n, m, d, deg, N).

        The sample grid is mapped to t in [-2, 2] (time_step h) so
        values stay O(1); the 1/h^d scaling amplifies f64 rounding by
        ~(N/4)^d, which the tolerance accounts for — a wrong edge row or
        sign is O(1) and cannot hide under it."""
        h = 4.0 / N
        cfg = sg.SavgolConfig(n, m, d, time_step=h)
        f = sg.Savgol1D.create(cfg, dtype=F64)
        t = (np.arange(N) - N // 2) * h
        coeffs = np.random.default_rng(q * 131 + N).uniform(-1, 1, q + 1)
        P = np.polynomial.Polynomial(coeffs)
        x = jnp.asarray(P(t), dtype=F64)
        want = P.deriv(d)(t) if d <= q else np.zeros_like(t)
        got = np.asarray(f.apply(x))
        tol = 1e-13 * (1.0 / h) ** d * max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got, want, atol=tol,
                                   err_msg=f"{(n, m, d, q, N)}")

    def test_reference_edge_sign_compat(self):
        """reference_edge_sign=True reproduces the C's -3 at the leading
        edge for odd derivatives."""
        f = make_filter(5, 2, d=1)
        x = jnp.asarray(3.0 * np.arange(50), dtype=F64)
        y = np.asarray(f.apply(x, reference_edge_sign=True))
        np.testing.assert_allclose(y[:5], -3.0, atol=1e-9)
        np.testing.assert_allclose(y[5:], 3.0, atol=1e-9)

    def test_second_derivative_of_parabola(self):
        f = make_filter(6, 3, d=2)
        x = jnp.asarray(0.5 * np.arange(60.0) ** 2, dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-7)

    def test_time_step_scaling(self):
        dt = 0.01
        f = make_filter(5, 2, d=1, dt=dt)
        t = np.arange(50) * dt
        x = jnp.asarray(3.0 * t, dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-6)

    def test_noise_reduction_rms(self):
        # test_savgol.c:414-445 — smoothing reduces noise RMS
        rng = np.random.default_rng(12345)
        clean = np.sin(np.linspace(0, 4 * np.pi, 500))
        noisy = clean + 0.1 * rng.standard_normal(500)
        f = make_filter(8, 3)
        y = np.asarray(f.apply(jnp.asarray(noisy, dtype=F64)))
        rms_before = np.sqrt(np.mean((noisy - clean) ** 2))
        rms_after = np.sqrt(np.mean((y - clean) ** 2))
        assert rms_after < 0.5 * rms_before


class TestBoundaryModes:
    @pytest.mark.parametrize("mode", [sg.BoundaryMode.POLYNOMIAL,
                                      sg.BoundaryMode.REFLECT,
                                      sg.BoundaryMode.PERIODIC,
                                      sg.BoundaryMode.CONSTANT])
    def test_constant_signal_all_modes(self, mode):
        # test_savgol.c:300-364
        f = make_filter(5, 2, boundary=mode)
        x = jnp.full((40,), 7.0, dtype=F64)
        y = f.apply(x)
        np.testing.assert_allclose(np.asarray(y), 7.0, atol=1e-9)

    @pytest.mark.parametrize("name", ["polynomial", "reflect", "periodic",
                                      "constant"])
    def test_boundary_accepts_strings(self, name):
        """apply(boundary=...) coerces the same strings SavgolConfig does."""
        f = make_filter(4, 2)
        x = jnp.asarray(np.random.default_rng(9).standard_normal(64),
                        dtype=F64)
        a = np.asarray(f.apply(x, boundary=name))
        b = np.asarray(f.apply(x, boundary=sg.BoundaryMode(name)))
        np.testing.assert_array_equal(a, b)

    def test_bad_boundary_string_rejected(self):
        f = make_filter(4, 2)
        with pytest.raises(ValueError):
            f.apply(jnp.zeros(64, dtype=F64), boundary="mirror")

    def test_periodic_on_periodic_signal(self):
        """On an exactly periodic signal, PERIODIC edges behave like the
        interior."""
        N = 128
        x = np.sin(2 * np.pi * np.arange(N) / N * 4)
        f = make_filter(6, 3, boundary=sg.BoundaryMode.PERIODIC)
        y = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        # rolled input -> rolled output (circular shift equivariance)
        ys = np.asarray(f.apply(jnp.asarray(np.roll(x, 13), dtype=F64)))
        np.testing.assert_allclose(np.roll(y, 13), ys, atol=1e-12)

    def test_reflect_duplicates_edge_sample(self):
        """The reference's REFLECT is numpy 'symmetric' (edge duplicated),
        not 'reflect' (src/savgolFilter.c:452-463)."""
        n, m = 3, 2
        x = np.arange(20, dtype=np.float64) ** 1.5
        f = make_filter(n, m, boundary=sg.BoundaryMode.REFLECT)
        y = np.asarray(f.apply(jnp.asarray(x)))
        c, _ = sg.savgol_weights_np(sg.SavgolConfig(n, m), dtype=np.float64)
        ref = np.correlate(np.pad(x, n, mode="symmetric"), c, mode="valid")
        np.testing.assert_allclose(y, ref, atol=1e-12)


class TestScipyParity:
    @pytest.mark.parametrize("n,m,d", [(12, 4, 0), (5, 3, 1), (8, 4, 2),
                                       (3, 2, 0), (16, 5, 0)])
    def test_interp_mode(self, n, m, d):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(300)
        f = make_filter(n, m, d)
        y = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        ref = savgol_filter(x, 2 * n + 1, m, deriv=d, mode="interp")
        np.testing.assert_allclose(y, ref, atol=1e-10)

    @pytest.mark.parametrize("mode,smode", [
        (sg.BoundaryMode.PERIODIC, "wrap"),
        (sg.BoundaryMode.CONSTANT, "nearest"),
    ])
    def test_padded_modes(self, mode, smode):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(200)
        f = make_filter(7, 3, boundary=mode)
        y = np.asarray(f.apply(jnp.asarray(x, dtype=F64)))
        ref = savgol_filter(x, 15, 3, mode=smode)
        np.testing.assert_allclose(y, ref, atol=1e-10)


class TestReferenceGoldenParity:
    """Golden-vector parity against the compiled reference C library
    (BASELINE target: max abs err <= 1e-6 on f32 data)."""

    @pytest.mark.parametrize("n,m,d", [(12, 4, 0), (5, 2, 0), (5, 2, 1),
                                       (8, 4, 2), (2, 2, 0), (32, 10, 0)])
    @pytest.mark.parametrize("boundary", ["polynomial", "reflect",
                                          "periodic", "constant"])
    def test_full_apply(self, ref, n, m, d, boundary):
        rng = np.random.default_rng(42)
        x = rng.standard_normal(350).astype(np.float32)
        theirs = ref.apply(x, n, m, d, boundary=boundary)
        f = sg.Savgol1D.create(
            sg.SavgolConfig(n, m, d, boundary=sg.BoundaryMode(boundary)),
            dtype=F64)
        ours = np.asarray(
            f.apply(jnp.asarray(x, dtype=F64), reference_edge_sign=True))
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(ours - theirs).max() <= 1e-6 * scale

    def test_valid_mode(self, ref):
        rng = np.random.default_rng(43)
        x = rng.standard_normal(300).astype(np.float32)
        theirs = ref.apply_valid(x, 12, 4)
        f = make_filter(12, 4)
        ours = np.asarray(f.apply_valid(jnp.asarray(x, dtype=F64)))
        assert ours.shape == theirs.shape
        assert np.abs(ours - theirs).max() <= 1e-6

    def test_f32_pipeline_parity(self, ref):
        """Full f32 device pipeline (weights f64->f32, data f32) stays
        within 1e-6 of the reference on O(1) data."""
        rng = np.random.default_rng(44)
        x = rng.standard_normal(1000).astype(np.float32)
        theirs = ref.apply(x, 12, 4, 0)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
        ours = np.asarray(f.apply(jnp.asarray(x)))
        assert np.abs(ours - theirs).max() <= 1e-6


class TestValidMode:
    def test_length_and_content(self):
        # test_savgol.c:370-408
        n = 6
        f = make_filter(n, 3)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal(100), dtype=F64)
        yv = f.apply_valid(x)
        assert yv.shape == (100 - 2 * n,)
        yf = f.apply(x)
        np.testing.assert_allclose(np.asarray(yv),
                                   np.asarray(yf)[n:-n], atol=1e-12)

    def test_too_short_raises(self):
        f = make_filter(6, 3)
        with pytest.raises(ValueError, match="window size"):
            f.apply(jnp.zeros((5,), dtype=F64))
        with pytest.raises(ValueError, match="window size"):
            f.apply_valid(jnp.zeros((12,), dtype=F64))


class TestBatchingAndAxis:
    def test_axis_argument(self):
        """axis= replaces savgol_apply_strided: filtering one column of a
        record array leaves other columns untouched by construction
        (test_savgol.c:245-294)."""
        rng = np.random.default_rng(6)
        rec = rng.standard_normal((100, 3))
        f = make_filter(5, 2)
        filtered_col = np.asarray(
            f.apply(jnp.asarray(rec[:, 1], dtype=F64)))
        out = np.asarray(f.apply(jnp.asarray(rec, dtype=F64), axis=0))
        np.testing.assert_allclose(out[:, 1], filtered_col, atol=1e-12)
        # columns are independent
        col0 = np.asarray(f.apply(jnp.asarray(rec[:, 0], dtype=F64)))
        np.testing.assert_allclose(out[:, 0], col0, atol=1e-12)

    def test_batched_equals_loop(self):
        rng = np.random.default_rng(7)
        xs = rng.standard_normal((4, 120))
        f = make_filter(8, 3)
        batched = np.asarray(f.apply(jnp.asarray(xs, dtype=F64)))
        for b in range(4):
            single = np.asarray(f.apply(jnp.asarray(xs[b], dtype=F64)))
            np.testing.assert_allclose(batched[b], single, atol=1e-12)

    def test_vmap(self):
        rng = np.random.default_rng(8)
        xs = jnp.asarray(rng.standard_normal((6, 90)), dtype=F64)
        f = make_filter(5, 3)
        vm = jax.vmap(f.apply)(xs)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(f.apply(xs)),
                                   atol=1e-12)

    def test_jit_with_filter_as_pytree(self):
        f = make_filter(5, 3)
        x = jnp.asarray(np.arange(80.0), dtype=F64)

        @jax.jit
        def run(flt, data):
            return flt.apply(data)

        np.testing.assert_allclose(np.asarray(run(f, x)),
                                   np.asarray(f.apply(x)), atol=1e-12)


class TestDifferentiability:
    def test_grad_flows(self):
        """The filter is linear, so grad of sum(filter(x)) is the column-sum
        of the filter matrix — finite and correct."""
        f = make_filter(4, 2)
        x = jnp.asarray(np.arange(30.0), dtype=F64)
        g = jax.grad(lambda v: jnp.sum(f.apply(v)))(x)
        assert np.all(np.isfinite(np.asarray(g)))
        # directional derivative check
        v = jnp.asarray(np.random.default_rng(3).standard_normal(30),
                        dtype=F64)
        eps = 1e-6
        fd = (np.sum(np.asarray(f.apply(x + eps * v)))
              - np.sum(np.asarray(f.apply(x - eps * v)))) / (2 * eps)
        np.testing.assert_allclose(float(g @ v), fd, rtol=1e-6)


class TestDtypePromotion:
    def test_int_input_promoted(self):
        """Integer inputs must promote to the weights' float dtype —
        casting f32 weights down to int truncates them to zero (found by
        runtime probing)."""
        f = sg.Savgol1D.create(sg.SavgolConfig(2, 1), dtype=jnp.float32)
        y = np.asarray(f.apply(jnp.arange(10)))
        np.testing.assert_allclose(y, np.arange(10.0), atol=1e-5)
        yv = np.asarray(f.apply_valid(jnp.arange(10)))
        np.testing.assert_allclose(yv, np.arange(2.0, 8.0), atol=1e-5)

    def test_int_input_2d(self):
        f = sg.Savgol2D.create(sg.Savgol2DConfig(1, 1, 1), dtype=jnp.float32)
        img = jnp.arange(25).reshape(5, 5)
        y = np.asarray(f.apply_valid(img))
        np.testing.assert_allclose(
            y, np.arange(25.0).reshape(5, 5)[1:-1, 1:-1], atol=1e-4)


class TestMXUPath:
    @pytest.mark.parametrize("boundary", list(sg.BoundaryMode))
    def test_method_mxu_matches_xla(self, boundary):
        rng = np.random.default_rng(20)
        x = jnp.asarray(rng.standard_normal((3, 500)), dtype=F64)
        f = make_filter(8, 3, 1, boundary=boundary)
        got = np.asarray(f.apply(x, method="mxu"))
        want = np.asarray(f.apply(x))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_valid_mxu(self):
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.standard_normal(300), dtype=F64)
        f = make_filter(6, 3)
        np.testing.assert_allclose(
            np.asarray(f.apply_valid(x, method="mxu")),
            np.asarray(f.apply_valid(x)), atol=1e-12)

    def test_mxu_differentiable(self):
        f = make_filter(4, 2)
        x = jnp.asarray(np.arange(200.0), dtype=F64)
        g = jax.grad(lambda v: jnp.sum(f.apply(v, method="mxu") ** 2))(x)
        g2 = jax.grad(lambda v: jnp.sum(f.apply(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   atol=1e-10)

    def test_invalid_method_rejected(self):
        f = make_filter(4, 2)
        x = jnp.zeros(100, dtype=F64)
        with pytest.raises(ValueError, match="method"):
            f.apply(x, method="bogus")
        with pytest.raises(ValueError, match="method"):
            f.apply_valid(x, method="bogus")

    def test_method_auto_resolves(self):
        # on CPU auto -> xla; result matches
        f = make_filter(6, 3)
        x = jnp.asarray(np.arange(120.0), dtype=F64)
        np.testing.assert_array_equal(np.asarray(f.apply(x, method="auto")),
                                      np.asarray(f.apply(x)))


class TestReferenceFuzz:
    def test_random_config_grid(self, ref):
        """30 random (n, m, d, boundary, N) draws vs the compiled C."""
        rng = np.random.default_rng(2024)
        for trial in range(30):
            n = int(rng.integers(1, 33))
            m = int(rng.integers(0, min(2 * n, 10) + 1))
            d = int(rng.integers(0, min(m, 4) + 1))
            boundary = str(rng.choice(["polynomial", "reflect",
                                       "periodic", "constant"]))
            N = int(rng.integers(2 * n + 1, 400))
            x = rng.standard_normal(N).astype(np.float32)
            theirs = ref.apply(x, n, m, d, boundary=boundary)
            f = sg.Savgol1D.create(
                sg.SavgolConfig(n, m, d,
                                boundary=sg.BoundaryMode(boundary)),
                dtype=F64)
            ours = np.asarray(f.apply(jnp.asarray(x, dtype=F64),
                                      reference_edge_sign=True))
            scale = max(1.0, np.abs(theirs).max())
            err = np.abs(ours - theirs).max()
            assert err <= 2e-5 * scale, (
                f"trial {trial}: n={n} m={m} d={d} {boundary} N={N}: "
                f"err {err:.2e} scale {scale:.2e}")

    @pytest.mark.parametrize("hdt", ["bfloat16", "float16"])
    def test_half_precision_promoted(self, hdt):
        """Half inputs compute in f32 (bf16 weights would cost ~1e-2) and
        return in the input dtype."""
        dt = getattr(jnp, hdt)
        f = make_filter(8, 3, dtype=jnp.float32)
        rng = np.random.default_rng(30)
        x64 = rng.standard_normal(300)
        y = f.apply(jnp.asarray(x64, dtype=dt))
        assert y.dtype == dt
        ref = np.asarray(f.apply(jnp.asarray(x64, dtype=jnp.float32)))
        # residual error is just the input/output quantization
        tol = 8e-3 if hdt == "bfloat16" else 1e-3
        assert np.abs(np.asarray(y, dtype=np.float64) - ref).max() < tol
        yv = f.apply_valid(jnp.asarray(x64, dtype=dt))
        assert yv.dtype == dt

    def test_valid_mode_fuzz(self, ref):
        rng = np.random.default_rng(31337)
        for _ in range(15):
            n = int(rng.integers(1, 33))
            m = int(rng.integers(0, min(2 * n, 10) + 1))
            N = int(rng.integers(2 * n + 1, 300))
            x = rng.standard_normal(N).astype(np.float32)
            theirs = ref.apply_valid(x, n, m)
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
            ours = np.asarray(f.apply_valid(jnp.asarray(x, dtype=F64)))
            assert ours.shape == theirs.shape
            scale = max(1.0, np.abs(theirs).max())
            assert np.abs(ours - theirs).max() <= 2e-5 * scale


class TestBF16Path:
    """method="bf16": bfloat16 banded-MXU throughput mode (~5e-3 relative
    accuracy contract, ~2x the exact-path HBM ceiling on hardware)."""

    def test_poly_bf16_within_contract(self):
        rng = np.random.default_rng(40)
        x = jnp.asarray(rng.standard_normal((4, 2048)), dtype=jnp.float32)
        f = make_filter(8, 3, dtype=jnp.float32)
        got = np.asarray(f.apply(x, method="bf16"))
        want = np.asarray(f.apply(x, method="xla"))
        assert got.dtype == np.float32
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 3e-2 * scale

    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    def test_padded_modes_bf16(self, boundary):
        rng = np.random.default_rng(41)
        x = jnp.asarray(rng.standard_normal((2, 700)), dtype=jnp.float32)
        f = make_filter(6, 2, boundary=boundary, dtype=jnp.float32)
        got = np.asarray(f.apply(x, method="bf16"))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    def test_valid_bf16(self):
        rng = np.random.default_rng(42)
        x = jnp.asarray(rng.standard_normal((2, 600)), dtype=jnp.float32)
        f = make_filter(6, 2, dtype=jnp.float32)
        got = np.asarray(f.apply_valid(x, method="bf16"))
        want = np.asarray(f.apply_valid(x, method="xla"))
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    def test_bf16_geometry_fallback_is_exact(self):
        """The rare fully-inadmissible lengths (0 < N % c2 <= n for every
        candidate block width; 12289 = lcm(widths) + 1 is one) fall back
        to the exact f32 path — better than the contract, never worse."""
        rng = np.random.default_rng(43)
        x = jnp.asarray(rng.standard_normal((2, 12289)), dtype=jnp.float32)
        f = make_filter(12, 4, dtype=jnp.float32)
        got = np.asarray(f.apply(x, method="bf16"))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= 1e-5 * np.abs(want).max()

    def test_bf16_awkward_length_within_contract(self):
        """Non-dividing N now rides the MXU path via the padded slab-halo
        trailing fixup (no exact fallback) — still within the contract."""
        rng = np.random.default_rng(45)
        x = jnp.asarray(rng.standard_normal((2, 509)), dtype=jnp.float32)
        f = make_filter(5, 2, dtype=jnp.float32)
        got = np.asarray(f.apply(x, method="bf16"))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()

    def test_bf16_input_stays_bf16(self):
        rng = np.random.default_rng(44)
        x = jnp.asarray(rng.standard_normal((2, 512)), dtype=jnp.bfloat16)
        f = make_filter(4, 2, dtype=jnp.float32)
        y = f.apply(x, method="bf16")
        assert y.dtype == jnp.bfloat16

    def test_bf16_differentiable_via_exact_twin(self):
        f = make_filter(4, 2, dtype=jnp.float32)
        x = jnp.asarray(np.arange(512.0), dtype=jnp.float32)
        g = jax.grad(lambda v: jnp.sum(f.apply(v, method="bf16") ** 2))(x)
        g2 = jax.grad(lambda v: jnp.sum(f.apply(v, method="xla") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                                   rtol=2e-2, atol=1e-3)


class TestComplexInput:
    """scipy's savgol_filter accepts complex data; the filter is
    real-linear, so real/imag parts filter independently (stacked as one
    batch pair — a single kernel pass)."""

    def test_complex_is_real_linear(self):
        """Filtering complex data == filtering re/im independently (an
        extension beyond scipy, which silently CASTS complex to f64 and
        drops the imaginary part)."""
        rng = np.random.default_rng(80)
        x = (rng.standard_normal(500) + 1j * rng.standard_normal(500))
        f = make_filter(8, 3, dtype=jnp.float32)
        got = np.asarray(f.apply(jnp.asarray(x, dtype=jnp.complex64)))
        re = savgol_filter(x.real, 17, 3, mode="interp")
        im = savgol_filter(x.imag, 17, 3, mode="interp")
        assert got.dtype == np.complex64
        assert np.abs(got - (re + 1j * im)).max() <= 1e-5

    def test_complex_valid_and_boundaries(self):
        rng = np.random.default_rng(81)
        x = jnp.asarray(rng.standard_normal((2, 300))
                        + 1j * rng.standard_normal((2, 300)),
                        dtype=jnp.complex64)
        f = make_filter(6, 2, dtype=jnp.float32)
        yv = f.apply_valid(x)
        assert yv.shape == (2, 288) and yv.dtype == jnp.complex64
        np.testing.assert_allclose(
            np.asarray(yv).real,
            np.asarray(f.apply_valid(x.real.astype(jnp.float32))),
            atol=1e-6)
        yr = f.apply(x, boundary=sg.BoundaryMode.REFLECT)
        np.testing.assert_allclose(
            np.asarray(yr).imag,
            np.asarray(f.apply(x.imag.astype(jnp.float32),
                               boundary=sg.BoundaryMode.REFLECT)),
            atol=1e-6)

    def test_complex_2d(self):
        rng = np.random.default_rng(82)
        img = jnp.asarray(rng.standard_normal((40, 50))
                          + 1j * rng.standard_normal((40, 50)),
                          dtype=jnp.complex64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2),
                                dtype=jnp.float32)
        y = f2.apply(img)
        assert y.shape == img.shape and y.dtype == jnp.complex64
        np.testing.assert_allclose(
            np.asarray(y).real,
            np.asarray(f2.apply(img.real.astype(jnp.float32))), atol=1e-5)
