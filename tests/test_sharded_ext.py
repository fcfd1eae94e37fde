"""Sharded masked / nonuniform paths on an 8-device virtual CPU mesh
(parallel/sharded_ext.py): the overlap-save halo — which carries
(values, weights) or (values, weights, abscissae) — must reproduce the
single-device call in every boundary mode, gradients included.

Every sharded call here is JITTED: eager shard_map dispatches the
masked/nonuniform pipelines' hundreds of plane ops one at a time across
the 8 virtual devices (~30 s per call, measured) while the jitted call
compiles in ~1 s."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.parallel.sharded import make_mesh
from savgol_tpu.parallel.sharded_ext import (masked_apply_sharded,
                                             masked2d_apply_sharded,
                                             nonuniform_apply_sharded)

F64 = jnp.float64

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(("batch", "seq"), shape=(1, 8))


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(("batch", "seq"), shape=(2, 4))


@pytest.fixture(scope="module")
def mesh_rows():
    return make_mesh(("rows",), shape=(8,))


def _holed(rng, shape, frac=0.15):
    x = rng.standard_normal(shape)
    x[rng.random(shape) < frac] = np.nan
    return x


def _same(got, want, atol=1e-12):
    got, want = np.asarray(got), np.asarray(want)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], atol=atol, rtol=0)


def _jit(fn, **kw):
    return jax.jit(functools.partial(fn, **kw))


class TestMasked1DSharded:
    @pytest.mark.parametrize("boundary", ["truncate",
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT,
                                          sg.BoundaryMode.REFLECT])
    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (7, 4, 1)])
    def test_matches_single_device(self, mesh8, boundary, n, m, d):
        rng = np.random.default_rng(0)
        x = jnp.asarray(_holed(rng, (3, 512)), dtype=F64)
        kw = dict(half_window=n, poly_order=m, derivative=d,
                  boundary=boundary)
        got = _jit(masked_apply_sharded, mesh=mesh8, **kw)(x)
        want = _jit(sg.savgol_apply_masked, **kw)(x)
        _same(got, want)

    def test_weighted_and_batch_mesh(self, mesh2x4):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 256)), dtype=F64)
        w = rng.uniform(0.0, 2.0, size=(4, 256))
        w[w < 0.3] = 0.0
        w = jnp.asarray(w, dtype=F64)
        kw = dict(half_window=6, poly_order=3, fill=0.0)
        got = _jit(masked_apply_sharded, mesh=mesh2x4, **kw)(x, mask=w)
        want = _jit(sg.savgol_apply_masked, **kw)(x, mask=w)
        _same(got, want)

    def test_grad_matches_single_device(self, mesh8):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 256)), dtype=F64)
        w = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, 256)), dtype=F64)

        def loss(f):
            def g(xv, wv):
                return jnp.sum(f(xv, mask=wv) ** 2)
            return jax.jit(jax.grad(g, argnums=(0, 1)))(x, w)

        gs = loss(functools.partial(masked_apply_sharded, half_window=5,
                                    poly_order=2, fill=0.0, mesh=mesh8))
        gw = loss(functools.partial(sg.savgol_apply_masked,
                                    half_window=5, poly_order=2,
                                    fill=0.0))
        for a, b in zip(gs, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)

    def test_1d_input_and_errors(self, mesh8):
        rng = np.random.default_rng(3)
        x = jnp.asarray(_holed(rng, (512,)), dtype=F64)
        got = _jit(masked_apply_sharded, half_window=4, poly_order=2,
                   mesh=mesh8)(x)
        want = _jit(sg.savgol_apply_masked, half_window=4,
                    poly_order=2)(x)
        _same(got, want)
        with pytest.raises(ValueError, match="divide evenly"):
            masked_apply_sharded(jnp.zeros((2, 500)), half_window=4,
                                 poly_order=2, mesh=mesh8)
        with pytest.raises(ValueError, match="window size"):
            masked_apply_sharded(jnp.zeros((2, 64)), half_window=8,
                                 poly_order=2, mesh=mesh8)
        with pytest.raises(ValueError, match="not offered"):
            masked_apply_sharded(x, half_window=4, poly_order=2,
                                 mesh=mesh8,
                                 boundary=sg.BoundaryMode.POLYNOMIAL)


class TestNonuniformSharded:
    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (6, 2, 1)])
    def test_matches_single_device(self, mesh8, n, m, d):
        rng = np.random.default_rng(10)
        t = np.cumsum(rng.uniform(0.2, 1.5, size=(3, 512)), axis=-1)
        x = _holed(rng, (3, 512), frac=0.1)
        xj, tj = jnp.asarray(x, F64), jnp.asarray(t, F64)
        kw = dict(half_window=n, poly_order=m, derivative=d)
        got = _jit(nonuniform_apply_sharded, mesh=mesh8, **kw)(xj, tj)
        want = _jit(sg.savgol_apply_nonuniform, **kw)(xj, tj)
        _same(got, want)

    def test_shared_1d_t_and_batch_mesh(self, mesh2x4):
        rng = np.random.default_rng(11)
        t = np.cumsum(rng.uniform(0.2, 1.5, size=256))
        x = rng.standard_normal((4, 256))
        xj, tj = jnp.asarray(x, F64), jnp.asarray(t, F64)
        kw = dict(half_window=4, poly_order=2)
        got = _jit(nonuniform_apply_sharded, mesh=mesh2x4, **kw)(xj, tj)
        want = _jit(sg.savgol_apply_nonuniform, **kw)(xj, tj)
        _same(got, want)

    def test_grad_matches_single_device(self, mesh8):
        rng = np.random.default_rng(12)
        t = jnp.asarray(np.cumsum(rng.uniform(0.2, 1.5, size=(2, 256)),
                                  axis=-1), F64)
        x = jnp.asarray(rng.standard_normal((2, 256)), F64)
        kw = dict(half_window=4, poly_order=2, derivative=1, fill=0.0)

        def loss(f):
            def g(xv, tv):
                return jnp.sum(f(xv, tv) ** 2)
            return jax.jit(jax.grad(g, argnums=(0, 1)))(x, t)

        gs = loss(functools.partial(nonuniform_apply_sharded,
                                    mesh=mesh8, **kw))
        gw = loss(functools.partial(sg.savgol_apply_nonuniform, **kw))
        for a, b in zip(gs, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)


class TestMasked2DSharded:
    @pytest.mark.parametrize("boundary", ["truncate",
                                          sg.Boundary2D.PERIODIC,
                                          sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT])
    def test_matches_single_device(self, mesh_rows, boundary):
        rng = np.random.default_rng(20)
        img = jnp.asarray(_holed(rng, (64, 48)), dtype=F64)
        kw = dict(half_window_x=2, half_window_y=2, poly_order=2,
                  deriv_x=1, boundary=boundary)
        got = _jit(masked2d_apply_sharded, mesh=mesh_rows,
                   row_axis="rows", **kw)(img)
        want = _jit(sg.savgol2d_apply_masked, **kw)(img)
        _same(got, want)

    def test_batched_weighted_and_grad(self, mesh_rows):
        rng = np.random.default_rng(21)
        img = jnp.asarray(rng.standard_normal((2, 64, 32)), dtype=F64)
        w = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, 64, 32)), F64)
        kw = dict(half_window_x=2, half_window_y=2, poly_order=2,
                  fill=0.0)
        got = _jit(masked2d_apply_sharded, mesh=mesh_rows,
                   row_axis="rows", **kw)(img, mask=w)
        want = _jit(sg.savgol2d_apply_masked, **kw)(img, mask=w)
        _same(got, want)
        gs = jax.jit(jax.grad(lambda v: jnp.sum(masked2d_apply_sharded(
            v, mesh=mesh_rows, row_axis="rows", mask=w, **kw) ** 2)))(img)
        gw = jax.jit(jax.grad(lambda v: jnp.sum(sg.savgol2d_apply_masked(
            v, mask=w, **kw) ** 2)))(img)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gw),
                                   atol=1e-12)

    def test_errors(self, mesh_rows):
        with pytest.raises(ValueError, match="divide evenly"):
            masked2d_apply_sharded(jnp.zeros((63, 32)), half_window_x=2,
                                   half_window_y=2, poly_order=2,
                                   mesh=mesh_rows)
        with pytest.raises(ValueError, match="not offered"):
            masked2d_apply_sharded(jnp.zeros((64, 32)), half_window_x=2,
                                   half_window_y=2, poly_order=2,
                                   mesh=mesh_rows,
                                   boundary=sg.Boundary2D.VALID)
