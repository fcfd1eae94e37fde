"""Config validation — ports the rejection tests of
/root/reference/test/iterative/test_savgol.c:37-85 and the 2D validation of
test_savgol2d.c:27-71; errors are raised instead of NULL returns."""

import pytest

from savgol_tpu import (Boundary2D, BoundaryMode, Savgol2DConfig,
                        SavgolConfig, deriv1, deriv2, num_terms_2d, smooth)


class TestSavgolConfig:
    def test_valid_basic(self):
        cfg = SavgolConfig(half_window=2, poly_order=2)
        assert cfg.window_size == 5
        assert cfg.boundary is BoundaryMode.POLYNOMIAL

    def test_half_window_zero_rejected(self):
        with pytest.raises(ValueError, match="half_window"):
            SavgolConfig(half_window=0, poly_order=0)

    def test_half_window_too_large_rejected(self):
        with pytest.raises(ValueError, match="half_window"):
            SavgolConfig(half_window=33, poly_order=2)

    def test_poly_order_ge_window_rejected(self):
        # m must be < 2n+1 (src/savgolFilter.c:653)
        with pytest.raises(ValueError, match="poly_order"):
            SavgolConfig(half_window=2, poly_order=5)

    def test_poly_order_above_table_limit_rejected(self):
        # m <= 10 (SAVGOL_MAX_POLY_ORDER; GenFact table bound)
        with pytest.raises(ValueError, match="poly_order"):
            SavgolConfig(half_window=12, poly_order=11)

    def test_derivative_above_limit_rejected(self):
        with pytest.raises(ValueError, match="derivative"):
            SavgolConfig(half_window=5, poly_order=5, derivative=5)

    def test_derivative_above_poly_order_rejected(self):
        with pytest.raises(ValueError, match="derivative"):
            SavgolConfig(half_window=5, poly_order=2, derivative=3)

    def test_nonpositive_time_step_rejected(self):
        with pytest.raises(ValueError, match="time_step"):
            SavgolConfig(half_window=5, poly_order=2, time_step=0.0)
        with pytest.raises(ValueError, match="time_step"):
            SavgolConfig(half_window=5, poly_order=2, time_step=-1.0)

    def test_boundary_coercion_from_string(self):
        cfg = SavgolConfig(half_window=3, poly_order=2, boundary="reflect")
        assert cfg.boundary is BoundaryMode.REFLECT

    def test_hashable_static_arg(self):
        a = SavgolConfig(5, 3)
        b = SavgolConfig(5, 3)
        assert hash(a) == hash(b) and a == b

    def test_convenience_macros(self):
        # SAVGOL_SMOOTH / DERIV1 / DERIV2 (savgolFilter.h:209-222)
        assert smooth(5, 2).derivative == 0
        c1 = deriv1(5, 2, 0.5)
        assert c1.derivative == 1 and c1.time_step == 0.5
        c2 = deriv2(5, 3, 0.1)
        assert c2.derivative == 2 and abs(c2.dt_scale - 0.01) < 1e-12


class TestSavgol2DConfig:
    def test_valid(self):
        cfg = Savgol2DConfig(3, 3, 2)
        assert cfg.window_area == 49 and cfg.num_terms == 6

    def test_num_terms(self):
        assert num_terms_2d(0) == 1
        assert num_terms_2d(2) == 6
        assert num_terms_2d(3) == 10
        assert num_terms_2d(6) == 28

    def test_half_window_bounds(self):
        with pytest.raises(ValueError):
            Savgol2DConfig(0, 3, 2)
        with pytest.raises(ValueError):
            Savgol2DConfig(17, 3, 2)

    def test_poly_order_bound(self):
        with pytest.raises(ValueError):
            Savgol2DConfig(8, 8, 7)

    def test_deriv_sum_bound(self):
        with pytest.raises(ValueError):
            Savgol2DConfig(3, 3, 2, deriv_x=2, deriv_y=1)

    def test_window_too_small_for_terms(self):
        # 3x3 window (9 pts) cannot fit order-3 (10 terms)
        # (test_savgol2d.c window-too-small case)
        with pytest.raises(ValueError, match="window area"):
            Savgol2DConfig(1, 1, 3)

    def test_nonpositive_delta(self):
        with pytest.raises(ValueError):
            Savgol2DConfig(3, 3, 2, delta_x=0.0)

    def test_rectangular_ok(self):
        cfg = Savgol2DConfig(2, 1, 2)
        assert cfg.window_width == 5 and cfg.window_height == 3

    def test_scale(self):
        cfg = Savgol2DConfig(3, 3, 3, deriv_x=1, deriv_y=2,
                             delta_x=2.0, delta_y=0.5)
        assert abs(cfg.scale - 1.0 / (2.0 * 0.25)) < 1e-12
