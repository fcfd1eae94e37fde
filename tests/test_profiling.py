"""Profiling utility smoke tests."""

import jax.numpy as jnp
import numpy as np

from savgol_tpu.utils.profiling import benchmark, benchmark_chained, trace


def test_benchmark_helper():
    secs, out = benchmark(lambda v: v * 2.0, jnp.ones(128), iters=3,
                          warmup=1)
    assert secs > 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_benchmark_chained_same_shape():
    """The chained k-difference protocol runs and reports its ratio and
    the k-chain executable (for HLO inspection)."""
    w = jnp.asarray(np.random.default_rng(0).standard_normal((32, 32)),
                    jnp.float32)
    x = jnp.ones((32, 256), jnp.float32)
    per, ratio, ck = benchmark_chained(lambda v: jnp.tanh(w @ v), x,
                                       iters=2, k=4, return_info=True)
    assert isinstance(per, float) and isinstance(ratio, float)
    assert "tanh" in ck.as_text() or "call" in ck.as_text()


def test_benchmark_chained_geometry_feedback():
    """A VALID-style body (shrinking output) works with an explicit
    re-padding feedback."""
    def fn(v):
        return v[:, 2:-2] * 0.5

    def fb(y, template):
        return jnp.pad(y, ((0, 0), (2, 2))).astype(template.dtype)

    per = benchmark_chained(fn, jnp.ones((8, 128), jnp.float32),
                            iters=2, k=4, feedback=fb)
    assert isinstance(per, float)


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "tr")):
        jnp.ones(8).sum().block_until_ready()
    # a trace directory must have been produced
    assert any((tmp_path / "tr").rglob("*"))


# ---- roofline model: anchored to the v5e per-step accounting ----------------

import pytest

from savgol_tpu.utils.roofline import (V5E, ChipSpec, speed_of_light_1d,
                                       speed_of_light_2d)


class TestRoofline:
    def test_1d_exact_matches_measured_accounting(self):
        """The bench config (128 x 1M f32, exact default) must reproduce
        ROADMAP.md's documented plateau: the measured 30.5 Gs/s chained
        rate sits at ~50% effective MXU utilization."""
        r = speed_of_light_1d((128, 1 << 20))
        assert r.bound == "mxu"
        assert 55e9 < r.ceiling_per_s < 75e9          # ~64 Gs/s ceiling
        measured_s = r.elements / 30.5e9              # 30.5 Gs/s chained
        assert 0.40 < r.utilization(measured_s) < 0.55

    def test_1d_bf16_is_bandwidth_bound(self):
        """Single-pass bf16 flips the binding ceiling to HBM."""
        r = speed_of_light_1d((128, 1 << 20), dtype="bfloat16")
        assert r.bound == "hbm"
        assert r.ceiling_per_s > 1.5e11               # ~205 Gs/s

    def test_2d_bf16_matches_measured_accounting(self):
        """The 2D bf16 row-banded kernel measured 22.4 Gpix/s chained =
        ~32% MXU (ROADMAP.md attribution); the model must agree."""
        r = speed_of_light_2d(11, shape=(16, 2048, 2048), dtype="bfloat16")
        assert r.bound == "mxu"
        assert 60e9 < r.ceiling_per_s < 80e9          # ~70 Gpix/s ceiling
        measured_s = r.elements / 22.4e9
        assert 0.28 < r.utilization(measured_s) < 0.37

    def test_auto_follows_input_dtype(self):
        exact = speed_of_light_1d((4, 4096))
        bf16 = speed_of_light_1d((4, 4096), dtype="bfloat16")
        assert exact.mxu_flops == 6 * bf16.mxu_flops
        assert exact.hbm_bytes == 2 * bf16.hbm_bytes

    def test_vpu_reports_bandwidth_ceiling_only(self):
        r = speed_of_light_1d((4, 4096), method="vpu")
        assert r.mxu_bound_s == 0.0 and r.bound == "hbm"

    def test_describe_and_errors(self):
        r = speed_of_light_1d((2, 1024))
        s = r.describe(measured_s=r.ceiling_s * 2)
        assert "50% of" in s and "v5e" in s
        with pytest.raises(ValueError, match="method"):
            speed_of_light_1d((2, 1024), method="warp")
        with pytest.raises(ValueError, match="dtype"):
            speed_of_light_1d((2, 1024), dtype="int8")
        with pytest.raises(ValueError, match="positive"):
            r.utilization(0.0)

    def test_custom_chip_scales_bounds(self):
        fast = ChipSpec("x", bf16_tflops=2 * V5E.bf16_tflops,
                        hbm_gbps=V5E.hbm_gbps)
        a = speed_of_light_1d((8, 8192))
        b = speed_of_light_1d((8, 8192), chip=fast)
        assert b.mxu_bound_s == pytest.approx(a.mxu_bound_s / 2)
        assert b.hbm_bound_s == a.hbm_bound_s
