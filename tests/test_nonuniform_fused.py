"""Fused nonuniform Pallas kernel (ops/pallas_nonuniform.py).

The kernel runs the staged pipeline's EXACT math (dd Hankel moments +
dd plane Cholesky, ops/lsq.py) per VMEM tile, so interpret-mode output
must agree with the staged XLA path to FMA-contraction rounding (~1e-8
relative — XLA fuses the two graphs differently) with an identical
fill pattern. All runs here are interpret-mode
on CPU with poly_order <= 2: the dd op chain's interpret discharge
scales explosively with the system size (CLAUDE.md), so the k >= 4
configs are exercised on the real chip only
(tests/test_hw_parity.py::TestNonuniform::test_nonuniform_fused_vs_xla).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savgol_tpu.ops.nonuniform import savgol_apply_nonuniform
from savgol_tpu.ops.pallas_nonuniform import nonuniform_fused_supported


def _irregular(rng, shape, hole_frac=0.0):
    t = np.cumsum(rng.uniform(0.2, 1.5, size=shape), axis=-1)
    x = np.sin(0.3 * t) + 0.05 * rng.standard_normal(shape)
    if hole_frac:
        x[rng.random(shape) < hole_frac] = np.nan
    return x.astype(np.float32), t.astype(np.float32)


def _both(x, t, **kw):
    ys = savgol_apply_nonuniform(jnp.asarray(x), jnp.asarray(t),
                                 method="xla", **kw)
    yf = savgol_apply_nonuniform(jnp.asarray(x), jnp.asarray(t),
                                 method="fused", **kw)
    return np.asarray(ys), np.asarray(yf)


def _assert_same(ys, yf):
    assert np.array_equal(np.isnan(ys), np.isnan(yf))
    fin = np.isfinite(ys)
    scale = max(1.0, float(np.abs(ys[fin]).max()) if fin.any() else 1.0)
    np.testing.assert_allclose(yf[fin], ys[fin], rtol=0,
                               atol=1e-7 * scale)


@pytest.mark.parametrize("n,m,d", [(3, 2, 0), (3, 2, 1), (3, 2, 2),
                                   (2, 1, 0), (4, 0, 0)])
def test_fused_equals_staged(n, m, d):
    rng = np.random.default_rng(100 + n * 10 + m * 2 + d)
    x, t = _irregular(rng, (3, 160), hole_frac=0.12)
    ys, yf = _both(x, t, half_window=n, poly_order=m, derivative=d)
    _assert_same(ys, yf)


def test_fused_weighted_mask():
    rng = np.random.default_rng(7)
    x, t = _irregular(rng, (2, 150))
    w = rng.uniform(0.0, 2.0, size=x.shape).astype(np.float32)
    w[w < 0.2] = 0.0
    ys, yf = _both(x, t, half_window=3, poly_order=2, derivative=1,
                   mask=jnp.asarray(w), fill=-5.0)
    _assert_same(ys, yf)


def test_fused_grad_parity():
    rng = np.random.default_rng(8)
    x, t = _irregular(rng, (2, 96))
    kw = dict(half_window=3, poly_order=2, derivative=1, fill=0.0)

    def loss(meth):
        def f(xv, tv):
            y = savgol_apply_nonuniform(xv, tv, method=meth, **kw)
            return jnp.sum(y ** 2)
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(t))

    gs, gf = loss("xla"), loss("fused")
    # the custom VJP routes backward through the staged twin: identical
    for a, b in zip(gs, gf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_axis_and_batch_shapes():
    rng = np.random.default_rng(9)
    x, t = _irregular(rng, (2, 2, 130), hole_frac=0.1)
    ys, yf = _both(np.swapaxes(x, 0, -1), np.swapaxes(t, 0, -1),
                   half_window=2, poly_order=1, axis=0)
    _assert_same(ys, yf)


def test_fused_nan_fill_does_not_retrace_per_call():
    # fill=NaN rides a repr() token through the lru/jit caches; two
    # calls must hit one trace (nan != nan would retrace every call)
    from savgol_tpu.ops.nonuniform import _nonuni_fused_diff
    _nonuni_fused_diff.cache_clear()
    rng = np.random.default_rng(10)
    x, t = _irregular(rng, (1, 96), hole_frac=0.3)
    kw = dict(half_window=2, poly_order=2, fill=float("nan"),
              method="fused")
    y1 = savgol_apply_nonuniform(jnp.asarray(x), jnp.asarray(t), **kw)
    y2 = savgol_apply_nonuniform(jnp.asarray(x), jnp.asarray(t), **kw)
    assert _nonuni_fused_diff.cache_info().currsize == 1
    assert _nonuni_fused_diff.cache_info().hits >= 1
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_supported_predicate_and_errors():
    assert nonuniform_fused_supported(64)
    assert not nonuniform_fused_supported(65)
    x = jnp.zeros((2, 300), jnp.float32)
    t = jnp.arange(300, dtype=jnp.float32)
    with pytest.raises(ValueError, match="fused nonuniform"):
        savgol_apply_nonuniform(x, t, half_window=65, poly_order=1,
                                method="fused")
    with pytest.raises(ValueError, match="method"):
        savgol_apply_nonuniform(x, t, half_window=2, poly_order=1,
                                method="banana")
