"""Sharded-execution tests on an 8-device virtual CPU mesh: overlap-save
halo exchange must reproduce the single-device result exactly in every
boundary mode, for sequence-only, batch+sequence, and ring-periodic cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg
from savgol_tpu.parallel.sharded import apply_sharded, make_mesh

F64 = jnp.float64

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(("batch", "seq"), shape=(1, 8))


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(("batch", "seq"), shape=(2, 4))


def _single(f, x, boundary):
    return np.asarray(f.apply(x, boundary=boundary))


class TestSequenceSharding:
    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    @pytest.mark.parametrize("n,m,d", [(5, 3, 0), (12, 4, 0), (6, 3, 1)])
    def test_matches_single_device(self, mesh8, boundary, n, m, d):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
        got = np.asarray(apply_sharded(
            x, f.center_weights, f.edge_weights, half_window=n,
            mesh=mesh8, boundary=boundary, dt_inv=f.dt_inv, derivative=d))
        want = _single(f, x, boundary)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_1d_input(self, mesh8):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal(256), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        got = np.asarray(apply_sharded(
            x, f.center_weights, f.edge_weights, half_window=4, mesh=mesh8))
        np.testing.assert_allclose(got, np.asarray(f.apply(x)), atol=1e-12)

    def test_indivisible_length_raises(self, mesh8):
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        with pytest.raises(ValueError, match="divide evenly"):
            apply_sharded(jnp.zeros((2, 100), dtype=F64),
                          f.center_weights, f.edge_weights,
                          half_window=4, mesh=mesh8)

    def test_shard_too_short_raises(self, mesh8):
        # 8 shards x 8 samples each < window 17
        f = sg.Savgol1D.create(sg.SavgolConfig(8, 3), dtype=F64)
        with pytest.raises(ValueError, match="window size"):
            apply_sharded(jnp.zeros((1, 64), dtype=F64),
                          f.center_weights, f.edge_weights,
                          half_window=8, mesh=mesh8)


class TestBatchPlusSequence:
    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.PERIODIC])
    def test_2x4_mesh(self, mesh2x4, boundary):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 256)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(7, 3), dtype=F64)
        got = np.asarray(apply_sharded(
            x, f.center_weights, f.edge_weights, half_window=7,
            mesh=mesh2x4, boundary=boundary))
        np.testing.assert_allclose(got, _single(f, x, boundary), atol=1e-12)

    def test_under_jit(self, mesh2x4):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 128)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 2), dtype=F64)

        @jax.jit
        def run(data):
            return apply_sharded(
                data, f.center_weights, f.edge_weights, half_window=5,
                mesh=mesh2x4)

        np.testing.assert_allclose(np.asarray(run(x)),
                                   np.asarray(f.apply(x)), atol=1e-12)


class TestDataParallelOnly:
    def test_batch_sharding_via_device_put(self):
        """Pure DP: shard the batch axis with NamedSharding; results match
        (this is XLA-automatic, no shard_map needed)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(("batch",), shape=(8,))
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((16, 300)), dtype=F64)
        xs = jax.device_put(x, NamedSharding(mesh, P("batch", None)))
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=F64)
        got = np.asarray(jax.jit(f.apply)(xs))
        np.testing.assert_allclose(got, np.asarray(f.apply(x)), atol=1e-12)


class TestSharded2D:
    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT,
                                          sg.Boundary2D.PERIODIC,
                                          sg.Boundary2D.VALID])
    def test_matches_single_device_2d(self, mesh8, boundary):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.standard_normal((64, 40)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2), dtype=F64)
        got = np.asarray(apply2d_sharded(
            img, f2.weights, mesh=mesh8, boundary=boundary,
            scale=f2.scale))
        want = np.asarray(f2.apply(img, boundary=boundary))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_batched_2d_on_2x4(self, mesh2x4):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.standard_normal((4, 32, 24)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)
        got = np.asarray(apply2d_sharded(
            imgs, f2.weights, mesh=mesh2x4, scale=f2.scale))
        want = np.asarray(f2.apply(imgs))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_boundary_string_coerced_2d(self, mesh8):
        """'valid' as a string must behave exactly like Boundary2D.VALID
        (review finding: the string skipped the VALID row trim — wrong
        shape AND values, silently)."""
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.standard_normal((64, 40)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2), dtype=F64)
        a = np.asarray(apply2d_sharded(img, f2.weights, mesh=mesh8,
                                       boundary="valid", scale=f2.scale))
        b = np.asarray(apply2d_sharded(img, f2.weights, mesh=mesh8,
                                       boundary=sg.Boundary2D.VALID,
                                       scale=f2.scale))
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)

    def test_row_shard_too_small(self, mesh8):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        with pytest.raises(ValueError, match="window height"):
            apply2d_sharded(jnp.zeros((16, 40), dtype=F64), f2.weights,
                            mesh=mesh8, scale=f2.scale)


class TestTiled2D:
    """Two-axis (rows x cols) mesh tiling: column halos ride the second
    mesh dimension; corners arrive transitively through the row exchange
    of the column-extended tile."""

    @pytest.fixture(scope="class")
    def mesh_rc(self):
        return make_mesh(("seq", "cols"), shape=(2, 4))

    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT,
                                          sg.Boundary2D.PERIODIC,
                                          sg.Boundary2D.VALID])
    def test_matches_single_device(self, mesh_rc, boundary):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.standard_normal((64, 48)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2), dtype=F64)
        got = np.asarray(apply2d_sharded(
            img, f2.weights, mesh=mesh_rc, boundary=boundary,
            scale=f2.scale, col_axis="cols"))
        want = np.asarray(f2.apply(img, boundary=boundary))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rectangular_window_and_batch(self, mesh_rc):
        # asymmetric ny != nx exercises distinct halo widths per axis;
        # leading batch dims stay unsharded here (row/col mesh is full)
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(12)
        imgs = jnp.asarray(rng.standard_normal((3, 32, 40)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(4, 2, 2), dtype=F64)
        got = np.asarray(apply2d_sharded(
            imgs, f2.weights, mesh=mesh_rc, scale=f2.scale,
            batch_axis=None, col_axis="cols"))
        want = np.asarray(f2.apply(imgs))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_gradient_matches_single_device(self, mesh_rc):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(13)
        img = jnp.asarray(rng.standard_normal((32, 32)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)

        def loss_sharded(v):
            return jnp.sum(apply2d_sharded(
                v, f2.weights, mesh=mesh_rc, scale=f2.scale,
                boundary=sg.Boundary2D.PERIODIC, col_axis="cols") ** 2)

        def loss_single(v):
            return jnp.sum(
                f2.apply(v, boundary=sg.Boundary2D.PERIODIC) ** 2)

        g1 = np.asarray(jax.grad(loss_sharded)(img))
        g2 = np.asarray(jax.grad(loss_single)(img))
        np.testing.assert_allclose(g1, g2, atol=1e-12)

    def test_col_shard_constraints(self, mesh_rc):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2), dtype=F64)
        with pytest.raises(ValueError, match="divide evenly"):
            apply2d_sharded(jnp.zeros((64, 42), dtype=F64), f2.weights,
                            mesh=mesh_rc, scale=f2.scale, col_axis="cols")
        with pytest.raises(ValueError, match="window width"):
            apply2d_sharded(jnp.zeros((64, 24), dtype=F64), f2.weights,
                            mesh=mesh_rc, scale=f2.scale, col_axis="cols")
        with pytest.raises(ValueError, match="mesh dimension"):
            apply2d_sharded(jnp.zeros((64, 48), dtype=F64), f2.weights,
                            mesh=mesh_rc, scale=f2.scale, col_axis="nope")

    def test_rdma_tiled_needs_hardware(self, mesh_rc):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 2, 2), dtype=F64)
        with pytest.raises(NotImplementedError, match="rdma"):
            apply2d_sharded(jnp.zeros((64, 48), dtype=F64), f2.weights,
                            mesh=mesh_rc, scale=f2.scale,
                            col_axis="cols", halo="rdma")


class TestShardedFastPaths:
    """The per-shard local correlation must run on the same fast kernels as
    the single-chip path (VERDICT: the multi-chip story must compose the
    fast path). On CPU the Pallas route runs interpreted — semantics
    identical."""

    @pytest.mark.parametrize("method", ["pallas", "mxu", "xla"])
    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.PERIODIC])
    def test_methods_match_single_device(self, mesh8, method, boundary):
        rng = np.random.default_rng(7)
        n, m, d = 6, 3, 1
        x = jnp.asarray(rng.standard_normal((4, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
        got = np.asarray(apply_sharded(
            x, f.center_weights, f.edge_weights, half_window=n,
            mesh=mesh8, boundary=boundary, dt_inv=f.dt_inv, derivative=d,
            method=method))
        want = _single(f, x, boundary)
        np.testing.assert_allclose(got, want, atol=1e-9,
                                   err_msg=f"method={method}")

    def test_gradient_flows_through_pallas_shards(self, mesh8):
        """value_and_grad through the sharded Pallas route (the dryrun's
        training step shape)."""
        import jax

        rng = np.random.default_rng(8)
        n = 4
        x = jnp.asarray(rng.standard_normal((2, 256)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, 2), dtype=F64)

        def loss(v):
            y = apply_sharded(v, f.center_weights, f.edge_weights,
                              half_window=n, mesh=mesh8, method="pallas")
            return jnp.sum(y ** 2)

        g_sharded = np.asarray(jax.grad(loss)(x))
        g_single = np.asarray(jax.grad(
            lambda v: jnp.sum(f.apply(v) ** 2))(x))
        np.testing.assert_allclose(g_sharded, g_single, atol=1e-9)

    def test_invalid_method_rejected(self, mesh8):
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        with pytest.raises(ValueError, match="method"):
            apply_sharded(jnp.zeros((2, 256), dtype=F64),
                          f.center_weights, f.edge_weights,
                          half_window=4, mesh=mesh8, method="cuda")

    def test_2d_pallas_matches_single_device(self, mesh8):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded

        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.standard_normal((2, 64, 96)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        got = np.asarray(apply2d_sharded(
            img, f2.weights, mesh=mesh8, scale=f2.scale, method="pallas"))
        want = np.asarray(f2.apply(img))
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_sharded_bf16_matches_single_device(mesh8):
    """method='bf16' composes with overlap-save sharding: the sharded
    result matches the single-device bf16 path (same kernel per shard)."""
    rng = np.random.default_rng(60)
    x = jnp.asarray(rng.standard_normal((4, 4096)), dtype=jnp.float32)
    flt = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=jnp.float32)
    got = np.asarray(apply_sharded(
        x, flt.center_weights, flt.edge_weights, half_window=6,
        mesh=mesh8, boundary=sg.BoundaryMode.CONSTANT, dt_inv=flt.dt_inv,
        method="bf16"))
    ref = np.asarray(flt.apply(x, boundary=sg.BoundaryMode.CONSTANT,
                               method="xla"))
    assert np.abs(got - ref).max() <= 3e-2 * np.abs(ref).max()


def test_sharded2d_bf16_matches_single_device(mesh8):
    from savgol_tpu.parallel.sharded2d import apply2d_sharded
    rng = np.random.default_rng(61)
    img = jnp.asarray(rng.standard_normal((256, 128)), dtype=jnp.float32)
    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=jnp.float32)
    got = np.asarray(apply2d_sharded(
        img, f2.weights, mesh=mesh8, boundary=sg.Boundary2D.CONSTANT,
        scale=f2.scale, method="bf16"))
    ref = np.asarray(f2.apply(img, boundary=sg.Boundary2D.CONSTANT,
                              method="xla"))
    assert np.abs(got - ref).max() <= 3e-2 * np.abs(ref).max()


@pytest.fixture(scope="module")
def mesh_seq():
    """Sequence-only mesh: Pallas interpret mode can only DISCHARGE remote
    DMAs on single-named-axis meshes (dma_start_p limitation); the MESH
    dict device ids the kernel uses are exactly the multi-axis form the
    real Mosaic lowering supports on hardware."""
    return make_mesh(("seq",), shape=(8,))


class TestRdmaHalo:
    """halo='rdma': the Pallas make_async_remote_copy ring exchange
    (parallel/ici_halo.py) must be indistinguishable from the default
    ppermute path — validated here in TPU interpret mode on the virtual
    CPU mesh so real multi-chip hardware needs only the flag."""

    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.POLYNOMIAL,
                                          sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    def test_rdma_matches_single_device(self, mesh_seq, boundary):
        rng = np.random.default_rng(70)
        x = jnp.asarray(rng.standard_normal((3, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3, 1), dtype=F64)
        got = np.asarray(apply_sharded(
            x, f.center_weights, f.edge_weights, half_window=6,
            mesh=mesh_seq, boundary=boundary, dt_inv=f.dt_inv,
            derivative=1, halo="rdma"))
        np.testing.assert_allclose(got, _single(f, x, boundary),
                                   atol=1e-12)

    def test_rdma_equals_ppermute_bitwise(self, mesh_seq):
        rng = np.random.default_rng(71)
        x = jnp.asarray(rng.standard_normal((4, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3), dtype=F64)
        kw = dict(half_window=5, mesh=mesh_seq, dt_inv=f.dt_inv,
                  boundary=sg.BoundaryMode.PERIODIC)
        a = np.asarray(apply_sharded(x, f.center_weights, f.edge_weights,
                                     halo="rdma", **kw))
        b = np.asarray(apply_sharded(x, f.center_weights, f.edge_weights,
                                     halo="ppermute", **kw))
        np.testing.assert_array_equal(a, b)

    def test_gradient_through_rdma(self, mesh_seq):
        """The RDMA exchange's custom VJP (reverse-direction sends) must
        reproduce the ppermute path's gradient exactly."""
        rng = np.random.default_rng(72)
        x = jnp.asarray(rng.standard_normal((2, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)

        def loss(v, halo):
            y = apply_sharded(v, f.center_weights, f.edge_weights,
                              half_window=4, mesh=mesh_seq,
                              boundary=sg.BoundaryMode.PERIODIC,
                              halo=halo)
            return jnp.sum(y ** 2)

        g_rdma = np.asarray(jax.grad(lambda v: loss(v, "rdma"))(x))
        g_pp = np.asarray(jax.grad(lambda v: loss(v, "ppermute"))(x))
        np.testing.assert_allclose(g_rdma, g_pp, atol=1e-12)

    def test_gradient_through_rdma_size1_ring(self):
        """Ring of ONE device: forward short-circuits the kernel (a
        barrier'd remote self-copy wedges single-chip runtimes) and the
        backward must take the same identity route — grad == the
        unsharded filter's grad."""
        mesh1 = make_mesh(("seq",), shape=(1,), devices=jax.devices()[:1])
        rng = np.random.default_rng(73)
        x = jnp.asarray(rng.standard_normal((2, 256)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)

        def loss(v, **kw):
            y = apply_sharded(v, f.center_weights, f.edge_weights,
                              half_window=4,
                              boundary=sg.BoundaryMode.PERIODIC, **kw)
            return jnp.sum(y ** 2)

        g1 = np.asarray(jax.grad(
            lambda v: loss(v, mesh=mesh1, halo="rdma"))(x))
        g0 = np.asarray(jax.grad(
            lambda v: jnp.sum(f.apply(
                v, boundary=sg.BoundaryMode.PERIODIC) ** 2))(x))
        np.testing.assert_allclose(g1, g0, atol=1e-12)

    def test_boundary_string_coerced(self, mesh_seq):
        """String boundaries must coerce (review finding: the enum identity
        checks silently routed 'polynomial' to CONSTANT-clamp semantics)."""
        rng = np.random.default_rng(74)
        x = jnp.asarray(rng.standard_normal((2, 512)), dtype=F64)
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3, 1), dtype=F64)
        kw = dict(half_window=5, mesh=mesh_seq, dt_inv=f.dt_inv,
                  derivative=1)
        a = np.asarray(apply_sharded(x, f.center_weights, f.edge_weights,
                                     boundary="polynomial", **kw))
        b = np.asarray(apply_sharded(x, f.center_weights, f.edge_weights,
                                     boundary=sg.BoundaryMode.POLYNOMIAL,
                                     **kw))
        np.testing.assert_array_equal(a, b)

    def test_invalid_halo_rejected(self, mesh8):
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        with pytest.raises(ValueError, match="halo"):
            apply_sharded(jnp.zeros((2, 256), dtype=F64),
                          f.center_weights, f.edge_weights, half_window=4,
                          mesh=mesh8, halo="nccl")


class TestRdmaHalo2D:
    """halo='rdma' on the ROW-sharded 2D path: the row-block remote-DMA
    exchange (ici_halo.halo_exchange_rdma_rows) must be indistinguishable
    from the ppermute default — validated in TPU interpret mode on the
    virtual CPU mesh so real multi-chip hardware needs only the flag."""

    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT,
                                          sg.Boundary2D.PERIODIC,
                                          sg.Boundary2D.VALID])
    def test_rdma_matches_single_device(self, mesh_seq, boundary):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(80)
        img = jnp.asarray(rng.standard_normal((2, 64, 48)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 3, 2, deriv_y=1),
                                dtype=F64)
        got = np.asarray(apply2d_sharded(
            img, f2.weights, mesh=mesh_seq, boundary=boundary,
            scale=f2.scale, halo="rdma"))
        want = np.asarray(f2.apply(img, boundary=boundary))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rdma_equals_ppermute_bitwise(self, mesh_seq):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(81)
        img = jnp.asarray(rng.standard_normal((64, 80)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(3, 3, 2), dtype=F64)
        kw = dict(mesh=mesh_seq, boundary=sg.Boundary2D.REFLECT,
                  scale=f2.scale)
        a = np.asarray(apply2d_sharded(img, f2.weights, halo="rdma",
                                       **kw))
        b = np.asarray(apply2d_sharded(img, f2.weights, halo="ppermute",
                                       **kw))
        np.testing.assert_array_equal(a, b)

    def test_gradient_through_rdma_rows(self, mesh_seq):
        """The row exchange's custom VJP (swapped send directions,
        accumulation into head/tail rows) must reproduce the ppermute
        path's gradient exactly."""
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        rng = np.random.default_rng(82)
        img = jnp.asarray(rng.standard_normal((64, 32)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)

        def loss(v, halo):
            y = apply2d_sharded(v, f2.weights, mesh=mesh_seq,
                                boundary=sg.Boundary2D.CONSTANT,
                                scale=f2.scale, halo=halo)
            return jnp.sum(y ** 2)

        g_rdma = np.asarray(jax.grad(lambda v: loss(v, "rdma"))(img))
        g_pp = np.asarray(jax.grad(lambda v: loss(v, "ppermute"))(img))
        np.testing.assert_allclose(g_rdma, g_pp, atol=1e-12)

    def test_rdma_size1_ring(self):
        """Ring of one device: the exchange short-circuits to the identity
        (wrap-around halo == my own rows) for forward AND backward."""
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        mesh1 = make_mesh(("seq",), shape=(1,), devices=jax.devices()[:1])
        rng = np.random.default_rng(83)
        img = jnp.asarray(rng.standard_normal((32, 40)), dtype=F64)
        f2 = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2), dtype=F64)

        def loss(v):
            y = apply2d_sharded(v, f2.weights, mesh=mesh1,
                                boundary=sg.Boundary2D.CONSTANT,
                                scale=f2.scale, halo="rdma")
            return jnp.sum(y ** 2)

        got = np.asarray(apply2d_sharded(
            img, f2.weights, mesh=mesh1,
            boundary=sg.Boundary2D.CONSTANT, scale=f2.scale, halo="rdma"))
        want = np.asarray(f2.apply(img, boundary=sg.Boundary2D.CONSTANT))
        np.testing.assert_allclose(got, want, atol=1e-12)
        g1 = np.asarray(jax.grad(loss)(img))
        g0 = np.asarray(jax.grad(lambda v: jnp.sum(f2.apply(
            v, boundary=sg.Boundary2D.CONSTANT) ** 2))(img))
        np.testing.assert_allclose(g1, g0, atol=1e-12)

    def test_invalid_halo_rejected(self, mesh8):
        from savgol_tpu.parallel.sharded2d import apply2d_sharded
        with pytest.raises(ValueError, match="halo"):
            apply2d_sharded(jnp.zeros((32, 32), dtype=F64),
                            jnp.zeros((5, 5), dtype=F64), mesh=mesh8,
                            halo="nccl")


# ---- fuzz: random configs x mesh splits x halo impl vs single device -------
# The grid tests above pin specific points; this lane samples the sharded
# surface broadly (deterministic seed): (n, m, d) x boundary x sequence
# split x batch width x halo implementation, always against the
# single-device apply to 1e-12.
_FUZZ_CASES = []
_frng = np.random.default_rng(0xF027)
while len(_FUZZ_CASES) < 12:
    n = int(_frng.integers(1, 33))
    m = int(_frng.integers(0, min(2 * n, 11)))
    d = int(_frng.integers(0, min(m, 4) + 1))
    boundary = _frng.choice(list(sg.BoundaryMode))
    seq = int(_frng.choice([2, 4, 8]))
    B = (8 // seq) * int(_frng.integers(1, 3))
    L = int(_frng.integers(2 * n + 1, 400))     # per-shard length
    halo = str(_frng.choice(["ppermute", "rdma"]))
    _FUZZ_CASES.append((n, m, d, boundary, seq, B, seq * L, halo))


@pytest.mark.parametrize("n,m,d,boundary,seq,B,N,halo", _FUZZ_CASES)
def test_sharded_fuzz_matches_single_device(n, m, d, boundary, seq, B, N,
                                            halo):
    if halo == "rdma":
        # interpret mode can only discharge remote DMAs on single-named-
        # axis meshes (see mesh_seq above); size-`seq` ring, no batch axis
        mesh = make_mesh(("seq",), shape=(seq,),
                         devices=jax.devices()[:seq])
    else:
        mesh = make_mesh(("batch", "seq"), shape=(8 // seq, seq))
    rng = np.random.default_rng(n * 97 + N)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=F64)
    f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
    got = np.asarray(apply_sharded(
        x, f.center_weights, f.edge_weights, half_window=n, mesh=mesh,
        boundary=boundary, dt_inv=f.dt_inv, derivative=d, halo=halo))
    want = np.asarray(f.apply(x, boundary=boundary))
    np.testing.assert_allclose(got, want, atol=1e-12,
                               err_msg=f"{(n, m, d, boundary, seq, B, N, halo)}")


_FUZZ2D_CASES = []
_frng2 = np.random.default_rng(0xF028)
while len(_FUZZ2D_CASES) < 8:
    hx = int(_frng2.integers(1, 9))
    hy = int(_frng2.integers(1, 9))
    order = int(_frng2.integers(0, 5))
    if (2 * hx + 1) * (2 * hy + 1) < (order + 1) * (order + 2) // 2:
        continue
    pool = [(dx, dy) for dx in range(order + 1) for dy in range(order + 1)
            if dx + dy <= order]
    dx, dy = pool[int(_frng2.integers(0, len(pool)))]
    boundary = _frng2.choice([sg.Boundary2D.CONSTANT, sg.Boundary2D.REFLECT,
                              sg.Boundary2D.PERIODIC, sg.Boundary2D.VALID])
    seq = int(_frng2.choice([2, 4, 8]))
    R = seq * int(_frng2.integers(max(2 * hy + 1, 8), 40))
    C = int(_frng2.integers(2 * hx + 1, 100))
    halo = str(_frng2.choice(["ppermute", "rdma"]))
    _FUZZ2D_CASES.append((hx, hy, order, dx, dy, boundary, seq, R, C, halo))


@pytest.mark.parametrize("hx,hy,order,dx,dy,boundary,seq,R,C,halo",
                         _FUZZ2D_CASES)
def test_sharded2d_fuzz_matches_single_device(hx, hy, order, dx, dy,
                                              boundary, seq, R, C, halo):
    from savgol_tpu.parallel.sharded2d import apply2d_sharded

    if halo == "rdma":
        # interpret mode can only discharge remote DMAs on single-named-
        # axis meshes (see mesh_seq above); size-`seq` ring, no batch axis
        mesh = make_mesh(("seq",), shape=(seq,),
                         devices=jax.devices()[:seq])
    else:
        mesh = make_mesh(("batch", "seq"), shape=(8 // seq, seq))
    rng = np.random.default_rng(R * 31 + C)
    img = jnp.asarray(rng.standard_normal((R, C)), dtype=F64)
    cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
    try:
        f = sg.Savgol2D.create(cfg, dtype=F64)
    except np.linalg.LinAlgError:
        return                     # singular geometry: covered elsewhere
    got = np.asarray(apply2d_sharded(img, f.weights, mesh=mesh,
                                     boundary=boundary, scale=f.scale,
                                     halo=halo))
    want = np.asarray(f.apply(img, boundary=boundary))
    np.testing.assert_allclose(got, want, atol=1e-12,
                               err_msg=f"{(hx, hy, order, dx, dy, boundary, seq, R, C, halo)}")
