"""Fused masked-1D Pallas kernel (ops/pallas_masked.py) vs the staged path.

The fused kernel runs gram/rhs/count matmuls + the plane-Cholesky solve +
derivative extraction per VMEM tile; these tests pin it (interpret mode)
against the staged jnp pipeline — which the CPU lanes already pin against
f64 lstsq — plus the custom-VJP gradient path and the dispatch contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from savgol_tpu.ops.masked import _masked1d_fused_diff, savgol_apply_masked

F32 = jnp.float32


def _holed(rng, shape, frac=0.15):
    x = rng.standard_normal(shape).astype(np.float32)
    mask = rng.random(shape) > frac
    x[~mask] = np.nan
    return x, mask


class TestFusedKernel:
    @pytest.mark.parametrize("n,m,d", [(8, 3, 1), (12, 4, 0), (4, 2, 2),
                                       (32, 6, 0)])
    def test_matches_staged(self, n, m, d):
        rng = np.random.default_rng(n * 10 + d)
        x, mask = _holed(rng, (3, 500 + n))
        xz = jnp.asarray(np.where(mask, x, 0.0))
        w = jnp.asarray(mask.astype(np.float32))
        op = _masked1d_fused_diff(n, m, d, m + 1, float("nan"), 1.0)
        got = np.asarray(op(xz, w))
        want = np.asarray(savgol_apply_masked(
            jnp.asarray(x), half_window=n, poly_order=m, derivative=d,
            mask=jnp.asarray(mask), method="xla"))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        scale = max(1.0, np.abs(want[fin]).max())
        # truncated edge windows at high m sit beyond f32 normal
        # equations (cond(G) > 1/eps — e.g. n=32 m=6 edges reach
        # cond(A) ~ 7e3); there both solvers return the same ERROR CLASS
        # but not the same values, so compare the interior tightly and
        # only require finiteness at the edges (the f64-oracle accuracy
        # lanes in test_masked.py own the edge behavior)
        interior = fin.copy()
        interior[:, :2 * n] = interior[:, -2 * n:] = False
        assert np.abs(got[interior] - want[interior]).max() <= 2e-5 * scale

    def test_weighted(self):
        rng = np.random.default_rng(7)
        x, mask = _holed(rng, (2, 400))
        wts = np.where(mask, rng.uniform(0.2, 2.0, x.shape), 0.0)
        xz = jnp.asarray(np.where(mask, x, 0.0))
        op = _masked1d_fused_diff(6, 3, 0, 4, float("nan"), 1.0)
        got = np.asarray(op(xz, jnp.asarray(wts, F32)))
        want = np.asarray(savgol_apply_masked(
            jnp.asarray(x), half_window=6, poly_order=3,
            mask=jnp.asarray(wts, F32), method="xla"))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        scale = max(1.0, np.abs(want[fin]).max())
        assert np.abs(got[fin] - want[fin]).max() <= 2e-5 * scale

    def test_fill_and_quorum(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal(200).astype(np.float32)
        mask = np.ones(200, bool)
        mask[40:90] = False            # a hole wider than the window
        xz = jnp.asarray(np.where(mask, x, 0.0))
        w = jnp.asarray(mask.astype(np.float32))
        op = _masked1d_fused_diff(5, 2, 0, 3, -321.0, 1.0)
        got = np.asarray(op(xz, w))
        counts = np.convolve(mask.astype(int), np.ones(11, int), "same")
        np.testing.assert_array_equal(got == -321.0, counts < 3)
        assert np.isfinite(got).all()

    def test_gradient_matches_twin(self):
        rng = np.random.default_rng(11)
        x, mask = _holed(rng, (2, 300))
        xz = jnp.asarray(np.where(mask, x, 0.0))
        w = jnp.asarray(mask.astype(np.float32))
        op = _masked1d_fused_diff(6, 2, 1, 3, 0.0, 1.0)

        def staged_loss(v):
            y = savgol_apply_masked(
                v, half_window=6, poly_order=2, derivative=1,
                mask=jnp.asarray(mask), fill=0.0, method="xla")
            return jnp.sum(y ** 2)

        g_fused = np.asarray(jax.grad(
            lambda v: jnp.sum(op(v, w) ** 2))(xz))
        g_staged = np.asarray(jax.grad(staged_loss)(xz))
        # the staged grad flows d(where(valid, x, 0)) = mask * dx; the
        # fused op takes the sanitized xz directly, so compare on valid
        scale = max(1.0, np.abs(g_staged).max())
        d = np.abs((g_fused - g_staged) * mask).max()
        assert d <= 1e-4 * scale

    def test_odd_length_partial_block(self):
        # N not a multiple of the kernel's column tile exercises the
        # n_total masking (garbage reads must not leak into real outputs)
        rng = np.random.default_rng(13)
        x, mask = _holed(rng, (1, 131))
        xz = jnp.asarray(np.where(mask, x, 0.0))
        w = jnp.asarray(mask.astype(np.float32))
        op = _masked1d_fused_diff(4, 2, 0, 3, float("nan"), 1.0)
        got = np.asarray(op(xz, w))
        want = np.asarray(savgol_apply_masked(
            jnp.asarray(x), half_window=4, poly_order=2,
            mask=jnp.asarray(mask), method="xla"))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        assert np.abs(got[fin] - want[fin]).max() <= 2e-5


class TestDispatch:
    def test_auto_routes_through_fused_op_shape(self):
        # the auto path on CPU stays staged; this just pins that the
        # dispatch branch composes (boundary pads + slice) by equality
        # against method="xla" on the same inputs
        rng = np.random.default_rng(17)
        x, mask = _holed(rng, (2, 300))
        for boundary in ("truncate", "reflect"):
            a = np.asarray(savgol_apply_masked(
                jnp.asarray(x), half_window=5, poly_order=2,
                mask=jnp.asarray(mask), boundary=boundary))
            b = np.asarray(savgol_apply_masked(
                jnp.asarray(x), half_window=5, poly_order=2,
                mask=jnp.asarray(mask), boundary=boundary,
                method="xla"))
            fin = np.isfinite(b)
            assert np.array_equal(fin, np.isfinite(a))
            np.testing.assert_allclose(a[fin], b[fin], atol=1e-5)
