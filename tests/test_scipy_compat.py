"""scipy_compat: drop-in parity with scipy.signal across every mode,
coefficient parity incl. the pos= argument, and the extension modes."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import savgol_coeffs as sp_coeffs
from scipy.signal import savgol_filter as sp_filter

from savgol_tpu.scipy_compat import savgol_coeffs, savgol_filter

F64 = jnp.float64


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(0).standard_normal(400)


class TestCoeffs:
    @pytest.mark.parametrize("wl,po,d", [(25, 4, 0), (11, 3, 1), (17, 4, 2),
                                         (5, 2, 0)])
    def test_matches_scipy(self, wl, po, d):
        ours = savgol_coeffs(wl, po, deriv=d)
        ref = sp_coeffs(wl, po, deriv=d)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    @pytest.mark.parametrize("pos", [0, 3, 5, 8, 10])
    def test_pos_argument(self, pos):
        ours = savgol_coeffs(11, 3, deriv=1, pos=pos)
        ref = sp_coeffs(11, 3, deriv=1, pos=pos)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_delta_scaling(self):
        ours = savgol_coeffs(11, 3, deriv=2, delta=0.5)
        ref = sp_coeffs(11, 3, deriv=2, delta=0.5)
        np.testing.assert_allclose(ours, ref, atol=1e-9)

    def test_use_dot(self):
        np.testing.assert_allclose(savgol_coeffs(9, 2, use="dot"),
                                   sp_coeffs(9, 2, use="dot"), atol=1e-12)

    def test_even_window_rejected(self):
        with pytest.raises(ValueError, match="odd"):
            savgol_coeffs(10, 2)


class TestFilter:
    @pytest.mark.parametrize("mode", ["interp", "mirror", "nearest",
                                      "wrap", "constant"])
    @pytest.mark.parametrize("wl,po,d", [(25, 4, 0), (11, 3, 1)])
    def test_matches_scipy_all_modes(self, x, mode, wl, po, d):
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), wl, po, deriv=d, mode=mode))
        ref = sp_filter(x, wl, po, deriv=d, mode=mode)
        np.testing.assert_allclose(ours, ref, atol=1e-9,
                                   err_msg=f"mode={mode}")

    def test_constant_cval(self, x):
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), 15, 3, mode="constant", cval=2.5))
        ref = sp_filter(x, 15, 3, mode="constant", cval=2.5)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_delta(self, x):
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), 11, 3, deriv=1, delta=0.01))
        ref = sp_filter(x, 11, 3, deriv=1, delta=0.01)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_axis(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((120, 5))
        ours = np.asarray(savgol_filter(jnp.asarray(a, dtype=F64), 11, 3,
                                        axis=0))
        ref = sp_filter(a, 11, 3, axis=0)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_bad_mode(self, x):
        with pytest.raises(ValueError, match="mode"):
            savgol_filter(jnp.asarray(x), 11, 3, mode="banana")

    def test_pallas_path(self, x):
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=jnp.float32), 25, 4, mode="interp",
            use_pallas=True))
        ref = sp_filter(x.astype(np.float64), 25, 4, mode="interp")
        assert np.abs(ours - ref).max() < 1e-5

    def test_mirror_pallas(self, x):
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=jnp.float32), 11, 3, mode="mirror",
            use_pallas=True))
        ref = sp_filter(x.astype(np.float64), 11, 3, mode="mirror")
        assert np.abs(ours - ref).max() < 1e-5


class TestScipyCorners:
    def test_deriv_above_polyorder_gives_zeros(self, x):
        """scipy semantics: the fit's higher derivatives vanish."""
        np.testing.assert_array_equal(savgol_coeffs(11, 3, deriv=4),
                                      np.zeros(11))
        y = np.asarray(savgol_filter(jnp.asarray(x, dtype=F64), 11, 3,
                                     deriv=4))
        np.testing.assert_array_equal(y, np.zeros_like(x))


class TestHighDerivatives:
    """deriv > 4: beyond the reference's cap (src/savgolFilter.c:659) but
    within scipy's (deriv <= polyorder) — the compat layer computes these
    directly from the Gram recurrence (VERDICT r2 item 6)."""

    @pytest.mark.parametrize("wl,po,d", [
        (13, 5, 5), (15, 6, 5), (15, 6, 6), (21, 8, 7), (25, 10, 9),
        (33, 10, 10)])
    def test_coeffs_match_scipy(self, wl, po, d):
        ours = savgol_coeffs(wl, po, deriv=d)
        ref = sp_coeffs(wl, po, deriv=d)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale)

    @pytest.mark.parametrize("mode", ["interp", "mirror", "nearest", "wrap"])
    def test_filter_matches_scipy(self, x, mode):
        wl, po, d = 15, 6, 5
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), wl, po, deriv=d, mode=mode))
        ref = sp_filter(x, wl, po, deriv=d, mode=mode)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale,
                                   err_msg=f"mode={mode}")

    def test_filter_high_deriv_with_delta(self, x):
        wl, po, d = 17, 7, 6
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), wl, po, deriv=d, delta=0.25))
        ref = sp_filter(x, wl, po, deriv=d, delta=0.25)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale)

    def test_config_keeps_reference_cap(self):
        """SavgolConfig itself still enforces the reference's d <= 4."""
        from savgol_tpu.config import SavgolConfig
        with pytest.raises(ValueError):
            SavgolConfig(7, 6, 5)

    def test_polyorder_ge_window_rejected(self):
        """scipy semantics: polyorder >= window_length is a ValueError on
        EVERY branch (a deriv that routes to the direct Gram path must not
        dodge validation into a 0/0 in the recurrence)."""
        for d in (0, 5, 11):
            with pytest.raises(ValueError, match="polyorder"):
                savgol_coeffs(11, 11, deriv=d)
            with pytest.raises(ValueError, match="polyorder"):
                savgol_filter(jnp.zeros(64), 11, 12, deriv=d)


class TestBeyondReferenceEnvelope:
    """Windows and orders past the reference caps (n <= 32, m <= 10) keep
    working through the direct Gram path — the 'drop-in with an import
    swap' claim holds for any scipy-legal (window, order, deriv)."""

    @pytest.mark.parametrize("wl,po,d", [(101, 3, 0), (101, 5, 5)])
    def test_coeffs_match_scipy(self, wl, po, d):
        ours = savgol_coeffs(wl, po, deriv=d)
        ref = sp_coeffs(wl, po, deriv=d)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale)

    @pytest.mark.parametrize("wl,po,d", [
        (75, 12, 0), (75, 12, 2), (33, 14, 14)])
    def test_high_order_coeffs_match_exact_rational(self, wl, po, d):
        """At high polyorder scipy's OWN lstsq construction drifts (its
        (75, 12, d=0) center coefficients are off by 1.2e-1 relative vs
        exact rational arithmetic) — so the oracle here is the rational
        normal-equations solve, which the Gram recurrence matches to
        ~1e-16 while remaining the scipy-API surface."""
        from tests.test_weights import exact_weights
        n = wl // 2
        exact = exact_weights(n, po, d, 0)
        ours = savgol_coeffs(wl, po, deriv=d, use="dot")
        scale = max(1.0, np.abs(exact).max())
        np.testing.assert_allclose(ours, exact, atol=1e-12 * scale)

    @pytest.mark.parametrize("mode", ["interp", "wrap"])
    def test_filter_matches_scipy_large_window(self, mode):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(600)
        ours = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), 101, 4, deriv=1, mode=mode))
        ref = sp_filter(x, 101, 4, deriv=1, mode=mode)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale,
                                   err_msg=f"mode={mode}")

    @pytest.mark.parametrize("pos", [2, 7.5])
    def test_high_deriv_pos(self, pos):
        ours = savgol_coeffs(15, 6, deriv=5, pos=pos)
        ref = sp_coeffs(15, 6, deriv=5, pos=pos)
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(ours, ref, atol=1e-8 * scale)


class TestFractionalPos:
    @pytest.mark.parametrize("pos", [0.5, 2.25, 5.0, 7.75, 9.5])
    @pytest.mark.parametrize("deriv", [0, 1, 2])
    def test_fractional_pos_matches_scipy(self, pos, deriv):
        ours = savgol_coeffs(11, 3, deriv=deriv, pos=pos)
        ref = sp_coeffs(11, 3, deriv=deriv, pos=pos)
        np.testing.assert_allclose(ours, ref, atol=1e-9)

    def test_fractional_pos_delta_and_dot(self):
        ours = savgol_coeffs(9, 4, deriv=1, pos=3.5, delta=0.25, use="dot")
        ref = sp_coeffs(9, 4, deriv=1, pos=3.5, delta=0.25, use="dot")
        np.testing.assert_allclose(ours, ref, atol=1e-9)

    def test_out_of_window_pos_rejected(self):
        with pytest.raises(ValueError, match="pos"):
            savgol_coeffs(11, 3, pos=11.5)


class TestExtensionModeMethods:
    """mirror/constant modes must honor every method, not just pallas."""

    @pytest.mark.parametrize("mode", ["mirror", "constant"])
    @pytest.mark.parametrize("method", ["xla", "mxu", "pallas", "auto"])
    def test_methods_agree(self, x, mode, method):
        base = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), 11, 3, mode=mode, method="xla"))
        got = np.asarray(savgol_filter(
            jnp.asarray(x, dtype=F64), 11, 3, mode=mode, method=method))
        np.testing.assert_allclose(got, base, atol=1e-9)

    @pytest.mark.parametrize("mode", ["mirror", "constant"])
    def test_unknown_method_rejected(self, x, mode):
        with pytest.raises(ValueError, match="method"):
            savgol_filter(jnp.asarray(x), 11, 3, mode=mode, method="cuda")


def test_bf16_method_in_extension_modes():
    """method='bf16' works in mirror/constant extension modes too (same
    contract as the native modes)."""
    rng = np.random.default_rng(99)
    x = rng.standard_normal(512).astype(np.float32)
    for mode in ("mirror", "constant"):
        got = np.asarray(savgol_filter(jnp.asarray(x), 17, 3,
                                       mode=mode, method="bf16"))
        want = np.asarray(savgol_filter(jnp.asarray(x), 17, 3,
                                        mode=mode, method="xla"))
        assert np.abs(got - want).max() <= 3e-2 * np.abs(want).max()
