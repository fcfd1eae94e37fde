"""Masked (traced n, m) weight generation + vmapped sweep tests: every
config in the sweep must match the static-shape path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.ops.sweep import savgol_apply_sweep, savgol_weights_masked
from savgol_tpu.ops.weights import savgol_weights_np

F64 = jnp.float64
M_ = 32
W_ = 65


class TestMaskedWeights:
    @pytest.mark.parametrize("n,m,d", [(1, 1, 0), (5, 3, 0), (12, 4, 0),
                                       (12, 4, 2), (32, 10, 4), (2, 2, 1)])
    def test_matches_static_generator(self, n, m, d):
        center, lead, trail = savgol_weights_masked(
            jnp.asarray(n), jnp.asarray(m), d, dtype=F64)
        c_ref, e_ref = savgol_weights_np(sg.SavgolConfig(n, m, d),
                                         dtype=np.float64)
        c = np.asarray(center)
        # window slice [_M-n, _M+n] holds the true stencil; rest is zero
        np.testing.assert_allclose(c[M_ - n:M_ + n + 1], c_ref, atol=1e-9)
        assert np.all(c[:M_ - n] == 0) and np.all(c[M_ + n + 1:] == 0)
        t = np.asarray(trail)
        for e in range(n):
            np.testing.assert_allclose(t[e, M_ - n:M_ + n + 1], e_ref[e],
                                       atol=1e-8)
        assert np.all(t[n:] == 0)

    def test_lead_rows_are_negative_targets(self):
        """lead[e] must equal the weight row at target t = e - n, i.e. the
        mirror of trail[e] with (-1)^d."""
        n, m, d = 6, 3, 1
        _, lead, trail = savgol_weights_masked(
            jnp.asarray(n), jnp.asarray(m), d, dtype=F64)
        le = np.asarray(lead)[:n, M_ - n:M_ + n + 1]
        tr = np.asarray(trail)[:n, M_ - n:M_ + n + 1]
        # w_{-t}[i] = (-1)^d w_t[-i]
        np.testing.assert_allclose(le, (-1) ** d * tr[:, ::-1], atol=1e-9)

    def test_no_nans_across_full_grid(self):
        """Every valid (n, m) in range produces finite masked weights —
        the k > m guard must stop NaN propagation (small n, large k)."""
        for n in (1, 2, 3, 32):
            for m in range(0, min(2 * n, 10) + 1):
                c, l, t = savgol_weights_masked(
                    jnp.asarray(n), jnp.asarray(m), 0, dtype=jnp.float32)
                assert np.isfinite(np.asarray(c)).all(), (n, m)
                assert np.isfinite(np.asarray(l)).all(), (n, m)
                assert np.isfinite(np.asarray(t)).all(), (n, m)


class TestSweepApply:
    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    def test_sweep_matches_static_path(self, boundary):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(300), dtype=F64)
        ns = [2, 5, 12, 32]
        ms = [2, 3, 4, 6]
        out = np.asarray(savgol_apply_sweep(
            x, jnp.asarray(ns), jnp.asarray(ms), boundary=boundary,
            dtype=F64))
        for c, (n, m) in enumerate(zip(ns, ms)):
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=F64)
            want = np.asarray(f.apply(x, boundary=boundary))
            np.testing.assert_allclose(out[c], want, atol=1e-8,
                                       err_msg=f"config {n},{m}")

    def test_sweep_derivative(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(200), dtype=F64)
        ns = [5, 8, 12]
        ms = [3, 4, 5]
        out = np.asarray(savgol_apply_sweep(
            x, jnp.asarray(ns), jnp.asarray(ms), derivative=1, dtype=F64))
        for c, (n, m) in enumerate(zip(ns, ms)):
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m, 1), dtype=F64)
            want = np.asarray(f.apply(x))   # correct-sign convention
            np.testing.assert_allclose(out[c], want, atol=1e-8)

    def test_sweep_batched_input(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((3, 150)), dtype=F64)
        out = savgol_apply_sweep(x, jnp.asarray([4, 9]),
                                 jnp.asarray([2, 3]), dtype=F64)
        assert out.shape == (2, 3, 150)
        f = sg.Savgol1D.create(sg.SavgolConfig(9, 3), dtype=F64)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(f.apply(x)), atol=1e-8)

    def test_single_compile_many_configs(self):
        """The sweep is one executable regardless of grid size."""
        x = jnp.asarray(np.arange(100.0), dtype=F64)
        ns = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8])
        ms = jnp.asarray([1, 2, 2, 3, 3, 3, 4, 4])
        out = savgol_apply_sweep(x, ns, ms, dtype=F64)
        # linear data preserved by every config
        np.testing.assert_allclose(np.asarray(out),
                                   np.broadcast_to(np.arange(100.0),
                                                   (8, 100)), atol=1e-7)

    def test_reference_edge_sign_matches_static_path(self):
        """reference_edge_sign=True reproduces the C's negated leading edge
        for odd derivatives, exactly as on the static-config path."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal(200), dtype=F64)
        ns, ms = [5, 12], [3, 4]
        out = np.asarray(savgol_apply_sweep(
            x, jnp.asarray(ns), jnp.asarray(ms), derivative=1,
            reference_edge_sign=True, dtype=F64))
        for c, (n, m) in enumerate(zip(ns, ms)):
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m, 1), dtype=F64)
            want = np.asarray(f.apply(x, reference_edge_sign=True))
            np.testing.assert_allclose(out[c], want, atol=1e-8)

    def test_too_short_input_raises_concrete(self):
        x = jnp.asarray(np.arange(20.0), dtype=F64)
        with pytest.raises(ValueError, match="widest window"):
            savgol_apply_sweep(x, jnp.asarray([12]), jnp.asarray([3]),
                               dtype=F64)

    def test_too_short_input_raises_traced(self):
        """Under an outer jit the half-windows are tracers; the conservative
        N >= 65 bound must still reject."""
        import jax

        x = jnp.asarray(np.arange(40.0), dtype=F64)

        def run(hw, po):
            return savgol_apply_sweep(x, hw, po, dtype=F64)

        with pytest.raises(ValueError, match="widest window"):
            jax.jit(run)(jnp.asarray([3]), jnp.asarray([2]))

    @pytest.mark.parametrize("method", ["pallas", "mxu", "xla"])
    def test_center_paths_agree(self, method):
        """The bank-kernel / banded-MXU / conv center paths are
        interchangeable."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal(300), dtype=F64)
        ns = jnp.asarray([2, 5, 12, 32])
        ms = jnp.asarray([2, 3, 4, 6])
        got = np.asarray(savgol_apply_sweep(x, ns, ms, method=method,
                                            dtype=F64))
        want = np.asarray(savgol_apply_sweep(x, ns, ms, method="xla",
                                             dtype=F64))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_short_input_above_window_works(self):
        """N >= 2n+1 but N < 32 (the masked window cap) must still work
        (regression: the windowed edge fix assumed N >= 32)."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal(20), dtype=F64)
        out = np.asarray(savgol_apply_sweep(x, jnp.asarray([4]),
                                            jnp.asarray([2]), dtype=F64))
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        np.testing.assert_allclose(out[0], np.asarray(f.apply(x)), atol=1e-8)

    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.CONSTANT])
    def test_integer_input_promoted(self, boundary):
        """Integer data must be promoted to the working dtype, not cast the
        float weights down to int (review repro: int32 input returned all
        zeros for pad boundaries and a scatter TypeError for POLYNOMIAL)."""
        xi = jnp.arange(100, dtype=jnp.int32)
        out = np.asarray(savgol_apply_sweep(
            xi[None], jnp.asarray([2]), jnp.asarray([2]), dtype=F64,
            boundary=boundary))
        assert out.dtype == np.float64
        # smoothing a ramp reproduces the ramp in the interior
        np.testing.assert_allclose(out[0, 0, 10:90],
                                   np.arange(10, 90, dtype=np.float64),
                                   atol=1e-8)
