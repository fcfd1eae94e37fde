"""Filter-bank tests: K filters over one window in one vmapped pass must
match K independent applies exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg

F64 = jnp.float64


class TestBank:
    def test_matches_independent_filters(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(300), dtype=F64)
        cfgs = [sg.SavgolConfig(8, 4, 0),
                sg.SavgolConfig(8, 4, 1, 0.5),
                sg.SavgolConfig(8, 4, 2, 0.5),
                sg.SavgolConfig(8, 3, 0)]
        bank = sg.SavgolBank.create(cfgs, dtype=F64)
        out = np.asarray(bank.apply(x))
        assert out.shape == (4, 300)
        for k, c in enumerate(cfgs):
            f = sg.Savgol1D.create(c, dtype=F64)
            np.testing.assert_allclose(out[k], np.asarray(f.apply(x)),
                                       atol=1e-12, err_msg=str(c))

    def test_smooth_and_derivatives(self):
        bank = sg.SavgolBank.smooth_and_derivatives(6, 3, 2, dtype=F64)
        x = jnp.asarray(0.5 * np.arange(60.0) ** 2, dtype=F64)
        out = np.asarray(bank.apply(x))
        np.testing.assert_allclose(out[0], np.asarray(x), atol=1e-8)
        np.testing.assert_allclose(out[1], np.arange(60.0), atol=1e-7)
        np.testing.assert_allclose(out[2], 1.0, atol=1e-7)

    def test_batched_input(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((5, 200)), dtype=F64)
        bank = sg.SavgolBank.smooth_and_derivatives(5, 3, 1, dtype=F64)
        out = bank.apply(x)
        assert out.shape == (2, 5, 200)

    def test_mixed_window_rejected(self):
        with pytest.raises(ValueError, match="share"):
            sg.SavgolBank.create([sg.SavgolConfig(5, 3),
                                  sg.SavgolConfig(6, 3)])

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            sg.SavgolBank.create([])

    def test_reference_edge_sign(self):
        x = jnp.asarray(3.0 * np.arange(50), dtype=F64)
        bank = sg.SavgolBank.create([sg.SavgolConfig(5, 2, 1)], dtype=F64)
        y = np.asarray(bank.apply(x, reference_edge_sign=True))[0]
        np.testing.assert_allclose(y[:5], -3.0, atol=1e-9)
        y2 = np.asarray(bank.apply(x))[0]
        np.testing.assert_allclose(y2, 3.0, atol=1e-9)

    def test_padded_boundary_bank(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal(150), dtype=F64)
        cfgs = [sg.SavgolConfig(6, 3, d, boundary=sg.BoundaryMode.REFLECT)
                for d in (0, 1)]
        bank = sg.SavgolBank.create(cfgs, dtype=F64)
        out = np.asarray(bank.apply(x))
        for k, c in enumerate(cfgs):
            f = sg.Savgol1D.create(c, dtype=F64)
            np.testing.assert_allclose(out[k], np.asarray(f.apply(x)),
                                       atol=1e-12)


class TestBankAxis:
    def test_axis0(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((120, 4)), dtype=F64)
        bank = sg.SavgolBank.smooth_and_derivatives(5, 3, 1, dtype=F64)
        out = bank.apply(x, axis=0)
        assert out.shape == (2, 120, 4)
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3, 0), dtype=F64)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(f.apply(x, axis=0)),
                                   atol=1e-12)

    def test_axis_negative(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((4, 120, 3)), dtype=F64)
        bank = sg.SavgolBank.smooth_and_derivatives(4, 2, 1, dtype=F64)
        out = bank.apply(x, axis=-2)
        assert out.shape == (2, 4, 120, 3)
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2, 1), dtype=F64)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   np.asarray(f.apply(x, axis=-2)),
                                   atol=1e-12)


class TestBankPallas:
    @pytest.mark.parametrize("boundary", [None, sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    def test_bank_pallas_matches_xla(self, boundary):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((3, 300)), dtype=F64)
        if boundary is None:
            bank = sg.SavgolBank.smooth_and_derivatives(8, 4, 2,
                                                        time_step=0.5,
                                                        dtype=F64)
        else:
            bank = sg.SavgolBank.create(
                [sg.SavgolConfig(6, 3, d, boundary=boundary)
                 for d in (0, 1)], dtype=F64)
        a = np.asarray(bank.apply(x))
        b = np.asarray(bank.apply(x, use_pallas=True))
        np.testing.assert_allclose(b, a, atol=1e-12)

    def test_bank_pallas_reference_sign(self):
        x = jnp.asarray(3.0 * np.arange(50), dtype=F64)
        bank = sg.SavgolBank.create([sg.SavgolConfig(5, 2, 1)], dtype=F64)
        y = np.asarray(bank.apply(x, use_pallas=True,
                                  reference_edge_sign=True))[0]
        np.testing.assert_allclose(y[:5], -3.0, atol=1e-9)

    def test_bank_pallas_axis(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((150, 4)), dtype=F64)
        bank = sg.SavgolBank.smooth_and_derivatives(5, 3, 1, dtype=F64)
        a = np.asarray(bank.apply(x, axis=0))
        b = np.asarray(bank.apply(x, axis=0, use_pallas=True))
        np.testing.assert_allclose(b, a, atol=1e-12)


class TestBankMXU:
    def test_bank_mxu_matches_vpu(self):
        from savgol_tpu.ops.pallas_conv import (
            correlate_valid_bank_pallas, correlate_valid_bank_pallas_mxu)
        rng = np.random.default_rng(90)
        x = jnp.asarray(rng.standard_normal((5, 700)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 25)), dtype=jnp.float32)
        got = np.asarray(correlate_valid_bank_pallas_mxu(
            x, w, interpret=True))
        want = np.asarray(correlate_valid_bank_pallas(x, w, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("N", [256, 300, 2048, 2061])
    def test_bank_mxu_geometries(self, N):
        from savgol_tpu.ops.apply import correlate_valid
        from savgol_tpu.ops.pallas_conv import correlate_valid_bank_pallas_mxu
        rng = np.random.default_rng(91)
        x = jnp.asarray(rng.standard_normal((3, N)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((4, 65)), dtype=jnp.float32)
        got = np.asarray(correlate_valid_bank_pallas_mxu(
            x, w, interpret=True))
        want = np.stack([np.asarray(correlate_valid(x, w[c]))
                         for c in range(4)])
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    def test_bank_mxu_folded_thin_batch(self):
        from savgol_tpu.ops.apply import correlate_valid
        from savgol_tpu.ops.pallas_conv import correlate_valid_bank_pallas_mxu
        rng = np.random.default_rng(92)
        x = jnp.asarray(rng.standard_normal((2, 20000)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 65)), dtype=jnp.float32)
        got = np.asarray(correlate_valid_bank_pallas_mxu(
            x, w, interpret=True))
        want = np.stack([np.asarray(correlate_valid(x, w[c]))
                         for c in range(3)])
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    def test_bank_half_input_promotes(self):
        """bf16 input promotes to f32 compute and restores dtype (the MXU
        bank at HIGHEST cannot take bf16 operands; the VPU bank would
        accumulate in bf16)."""
        rng = np.random.default_rng(93)
        x64 = rng.standard_normal((4, 500))
        bank = sg.SavgolBank.smooth_and_derivatives(6, 3, 1)
        xh = jnp.asarray(x64, dtype=jnp.bfloat16)
        y = bank.apply(xh, method="pallas")
        assert y.dtype == jnp.bfloat16
        ref = np.asarray(bank.apply(jnp.asarray(x64, dtype=jnp.float32),
                                    method="pallas"))
        err = np.abs(np.asarray(y, dtype=np.float32) - ref).max()
        assert err <= 8e-3 * max(1.0, np.abs(ref).max())
