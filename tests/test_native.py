"""Native C++ host runtime tests: cross-validation against the JAX path
(two independent implementations of the same math), the compiled reference
C, and the streaming protocol."""

import jax.numpy as jnp
import numpy as np
import pytest

import savgol_tpu as sg

native = pytest.importorskip("savgol_tpu.native")

F64 = jnp.float64


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


class TestHost1D:
    @pytest.mark.parametrize("n,m,d", [(12, 4, 0), (5, 3, 1), (8, 4, 2),
                                       (2, 2, 0), (32, 10, 4)])
    @pytest.mark.parametrize("boundary", list(sg.BoundaryMode))
    def test_matches_jax(self, rng, n, m, d, boundary):
        x = rng.standard_normal(300).astype(np.float32)
        cfg = sg.SavgolConfig(n, m, d, boundary=boundary)
        hf = native.HostSavgol1D(cfg)
        jf = sg.Savgol1D.create(cfg, dtype=F64)
        got = hf.apply(x)
        want = np.asarray(jf.apply(jnp.asarray(x, dtype=F64)))
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() <= 1e-6 * scale

    def test_matches_reference_c(self, ref, rng):
        x = rng.standard_normal(256).astype(np.float32)
        hf = native.HostSavgol1D(sg.SavgolConfig(12, 4))
        theirs = ref.apply(x, 12, 4)
        assert np.abs(hf.apply(x) - theirs).max() <= 1e-6

    def test_reference_edge_sign(self):
        x = (3.0 * np.arange(50)).astype(np.float32)
        hf = native.HostSavgol1D(sg.SavgolConfig(5, 2, 1))
        y = hf.apply(x, reference_edge_sign=True)
        np.testing.assert_allclose(y[:5], -3.0, atol=1e-5)
        y2 = hf.apply(x)
        np.testing.assert_allclose(y2, 3.0, atol=1e-5)

    def test_valid(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        hf = native.HostSavgol1D(sg.SavgolConfig(6, 3))
        yv = hf.apply_valid(x)
        assert yv.shape == (88,)
        np.testing.assert_allclose(yv, hf.apply(x)[6:-6], atol=1e-6)

    def test_weights_match_python(self):
        cfg = sg.SavgolConfig(12, 4, 2)
        hf = native.HostSavgol1D(cfg)
        c, e = hf.weights()
        cp, ep = sg.savgol_weights_np(cfg, dtype=np.float64)
        np.testing.assert_allclose(c, cp, atol=1e-12)
        np.testing.assert_allclose(e, ep, atol=1e-12)

    def test_invalid_config_rejected(self):
        with pytest.raises(ValueError):
            # bypass Python validation to hit the native validator
            cfg = sg.SavgolConfig(5, 3)
            object.__setattr__(cfg, "poly_order", 60)
            native.HostSavgol1D(cfg)

    def test_too_short_raises(self):
        hf = native.HostSavgol1D(sg.SavgolConfig(6, 3))
        with pytest.raises(ValueError):
            hf.apply(np.zeros(5, dtype=np.float32))

    def test_out_of_range_boundary_rejected(self):
        """sgh_create must reject boundary ints outside the enum (a bad
        value used to static_cast through and silently zero-fill edges)."""
        import ctypes
        lib = native.load_library()
        for bad in (-1, 4, 99):
            h = lib.sgh_create(5, 2, 0, ctypes.c_float(1.0), bad)
            assert not bool(h), f"boundary={bad} accepted"
        h = lib.sgh_create(5, 2, 0, ctypes.c_float(1.0), 0)
        assert bool(h)
        lib.sgh_destroy(h)


class TestHostStream:
    def test_conservation_and_parity(self, rng):
        x = rng.standard_normal(150).astype(np.float32)
        s = native.HostSavgolStream(sg.SavgolConfig(6, 3))
        outs = []
        for v in x:
            outs.extend(s.push_full(float(v)).tolist())
        outs.extend(s.flush().tolist())
        assert len(outs) == x.size
        assert s.samples_output == x.size
        jf = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=F64)
        want = np.asarray(jf.apply(jnp.asarray(x, dtype=F64)))
        assert np.abs(np.array(outs) - want).max() <= 1e-6

    def test_latency_gating(self):
        s = native.HostSavgolStream(sg.SavgolConfig(4, 2))
        assert s.latency == 4
        for i in range(8):
            _, ok = s.push(float(i))
            assert not ok
        _, ok = s.push(8.0)
        assert ok and s.ready

    def test_reset(self):
        s = native.HostSavgolStream(sg.SavgolConfig(3, 2))
        for i in range(10):
            s.push(float(i))
        s.reset()
        assert not s.ready and s.samples_received == 0

    def test_flush_clamp(self):
        s = native.HostSavgolStream(sg.SavgolConfig(6, 3))
        for i in range(20):
            s.push_full(float(i))
        assert len(s.flush(max_count=2)) == 2

    def test_matches_jax_stream(self, rng):
        x = rng.standard_normal(80).astype(np.float32)
        s = native.HostSavgolStream(sg.SavgolConfig(5, 3, 1))
        outs = []
        for v in x:
            outs.extend(s.push_full(float(v)).tolist())
        outs.extend(s.flush().tolist())
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3, 1), dtype=F64)
        want = np.asarray(sg.stream_apply(
            jnp.asarray(x, dtype=F64), f.center_weights, f.edge_weights,
            half_window=5, dt_inv=f.dt_inv, derivative=1))
        assert np.abs(np.array(outs) - want).max() <= 1e-5


class TestHost2D:
    @pytest.mark.parametrize("dx,dy", [(0, 0), (1, 0), (0, 1), (1, 1),
                                       (2, 0)])
    @pytest.mark.parametrize("boundary", list(sg.Boundary2D))
    def test_matches_jax(self, rng, dx, dy, boundary):
        img = rng.standard_normal((25, 31)).astype(np.float32)
        cfg = sg.Savgol2DConfig(3, 2, 3, deriv_x=dx, deriv_y=dy)
        hf = native.HostSavgol2D(cfg)
        jf = sg.Savgol2D.create(cfg, dtype=F64)
        got = hf.apply(img, boundary)
        want = np.asarray(jf.apply(jnp.asarray(img, dtype=F64),
                                   boundary=boundary))
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() <= 1e-6 * scale

    def test_weights_match_python(self):
        cfg = sg.Savgol2DConfig(4, 3, 3, deriv_x=1, deriv_y=1)
        hf = native.HostSavgol2D(cfg)
        wp = sg.savgol2d_weights_np(cfg, dtype=np.float64)
        np.testing.assert_allclose(hf.weights(), wp, atol=1e-10)

    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT,
                                          sg.Boundary2D.VALID])
    def test_wide_image_vector_path_matches_jax(self, rng, boundary):
        """Images with >= 64 columns take the blocked f32 paths (padded
        boundary synthesis + overlapping final block); parity vs the f64
        JAX oracle within f32 accumulation error."""
        img = rng.standard_normal((70, 100)).astype(np.float32)
        cfg = sg.Savgol2DConfig(5, 4, 3, deriv_x=1)
        hf = native.HostSavgol2D(cfg)
        jf = sg.Savgol2D.create(cfg, dtype=F64)
        got = hf.apply(img, boundary)
        want = np.asarray(jf.apply(jnp.asarray(img, dtype=F64),
                                   boundary=boundary))
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() <= 3e-6 * scale

    @pytest.mark.parametrize("boundary", ["constant", "reflect"])
    def test_wide_image_matches_reference_c(self, ref, rng, boundary):
        """The padded vector path (>= 64 cols) against the compiled
        reference's per-tap boundary remap — same f32 accumulation order,
        so agreement is at float-weight level."""
        img = rng.standard_normal((80, 96)).astype(np.float32)
        hf = native.HostSavgol2D(sg.Savgol2DConfig(4, 5, 3))
        theirs = ref.apply2d(img, 4, 5, 3, boundary=boundary)
        got = hf.apply(img, sg.Boundary2D[boundary.upper()])
        assert np.abs(got - theirs).max() <= 2e-6

    def test_matches_reference_c_2d(self, ref, rng):
        img = rng.standard_normal((20, 20)).astype(np.float32)
        hf = native.HostSavgol2D(sg.Savgol2DConfig(3, 3, 3))
        theirs = ref.apply2d(img, 3, 3, 3, boundary="constant")
        assert np.abs(hf.apply(img, sg.Boundary2D.CONSTANT)
                      - theirs).max() <= 2e-6


@pytest.fixture(scope="module")
def host1d():
    return native.HostSavgol1D(sg.SavgolConfig(12, 4))


class TestThreadedApply:
    """Threaded native paths are BIT-IDENTICAL to the single-thread apply
    (each thread runs the same kernel on a disjoint output span). This
    container is single-core, so only correctness is asserted; the
    speedup materializes on multi-core hosts."""

    def test_threaded_1d_bit_identical(self, host1d):
        rng = np.random.default_rng(70)
        x = rng.standard_normal(3_000_000).astype(np.float32)
        np.testing.assert_array_equal(host1d.apply_threaded(x),
                                      host1d.apply(x))
        np.testing.assert_array_equal(
            host1d.apply_threaded(x, n_threads=7), host1d.apply(x))

    def test_threaded_batch_bit_identical(self, host1d):
        rng = np.random.default_rng(71)
        xb = rng.standard_normal((17, 50_000)).astype(np.float32)
        want = np.stack([host1d.apply(r) for r in xb])
        np.testing.assert_array_equal(host1d.apply_threaded(xb), want)
        np.testing.assert_array_equal(
            host1d.apply_threaded(xb, n_threads=5), want)

    def test_threaded_boundaries(self):
        rng = np.random.default_rng(72)
        x = rng.standard_normal(2_000_000).astype(np.float32)
        for b in sg.BoundaryMode:
            f = native.HostSavgol1D(sg.SavgolConfig(8, 3, 1, boundary=b))
            np.testing.assert_array_equal(
                f.apply_threaded(x, n_threads=3), f.apply(x))

    def test_threaded_rejects_bad_shapes(self, host1d):
        with pytest.raises(ValueError):
            host1d.apply_threaded(np.zeros((2, 3, 4), dtype=np.float32))

    @pytest.mark.parametrize("boundary", list(sg.Boundary2D))
    def test_threaded_2d_bit_identical(self, boundary):
        rng = np.random.default_rng(73)
        img = rng.standard_normal((700, 900)).astype(np.float32)
        hf = native.HostSavgol2D(sg.Savgol2DConfig(5, 4, 3, deriv_x=1))
        want = hf.apply(img, boundary)
        np.testing.assert_array_equal(
            hf.apply_threaded(img, boundary), want)
        np.testing.assert_array_equal(
            hf.apply_threaded(img, boundary, n_threads=5), want)

    def test_threaded_2d_narrow_boundary_bit_identical(self):
        # narrow images keep the f64 scalar border path — threading must
        # not silently switch them to the padded f32 reduction
        rng = np.random.default_rng(74)
        img = rng.standard_normal((20_000, 40)).astype(np.float32)
        hf = native.HostSavgol2D(sg.Savgol2DConfig(3, 3, 2))
        np.testing.assert_array_equal(
            hf.apply_threaded(img, sg.Boundary2D.REFLECT, n_threads=4),
            hf.apply(img, sg.Boundary2D.REFLECT))


class TestStridedApply:
    """Native strided apply (reference savgol_apply_strided parity,
    src/savgolFilter.c:877-934 / test/iterative/test_savgol.c:245-294)."""

    @pytest.fixture
    def host1d(self):
        return native.HostSavgol1D(sg.SavgolConfig(3, 2))

    def test_structured_field_bit_identical(self, host1d):
        rng = np.random.default_rng(80)
        vals = rng.standard_normal(200).astype(np.float32)
        rec = np.zeros(200, dtype=[("timestamp", np.float32),
                                   ("value", np.float32),
                                   ("other", np.float32)])
        rec["value"] = vals
        out_rec = np.zeros_like(rec)
        got = host1d.apply_strided(rec["value"], out=out_rec["value"])
        np.testing.assert_array_equal(got, host1d.apply(vals))

    def test_sibling_fields_untouched(self, host1d):
        """The reference's 'other fields unchanged' check
        (test_savgol.c:277-290): only the addressed float is written."""
        rec = np.zeros(30, dtype=[("timestamp", np.float32),
                                  ("value", np.float32),
                                  ("other", np.float32)])
        rec["timestamp"] = np.arange(30)
        rec["value"] = 100.0
        rec["other"] = 999.0
        out_rec = np.zeros_like(rec)
        host1d.apply_strided(rec["value"], out=out_rec["value"])
        np.testing.assert_allclose(out_rec["value"], 100.0, atol=1e-2)
        np.testing.assert_array_equal(out_rec["timestamp"], 0.0)
        np.testing.assert_array_equal(out_rec["other"], 0.0)

    def test_interleaved_column_view(self, host1d):
        rng = np.random.default_rng(81)
        mat = rng.standard_normal((500, 4)).astype(np.float32)
        got = host1d.apply_strided(mat[:, 2])
        np.testing.assert_array_equal(got,
                                      host1d.apply(mat[:, 2].copy()))

    def test_matches_reference_strided(self, host1d, ref):
        rng = np.random.default_rng(82)
        x = rng.standard_normal(120).astype(np.float32)
        theirs, siblings = ref.apply_strided(x, 3, 2, stride_elems=3,
                                             offset_elems=1)
        assert not siblings.any()  # reference leaves sibling bytes alone
        ours = host1d.apply_strided(x, reference_edge_sign=True)
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(ours - theirs).max() <= 2e-5 * scale

    def test_matches_reference_strided_derivative(self, ref):
        f = native.HostSavgol1D(sg.SavgolConfig(6, 3, 1))
        rng = np.random.default_rng(83)
        x = rng.standard_normal(90).astype(np.float32)
        theirs, _ = ref.apply_strided(x, 6, 3, 1, stride_elems=5,
                                      offset_elems=3)
        rec = np.zeros((90, 5), dtype=np.float32)
        rec[:, 3] = x
        out = np.zeros_like(rec)
        f.apply_strided(rec[:, 3], out=out[:, 3],
                        reference_edge_sign=True)
        scale = max(1.0, np.abs(theirs).max())
        assert np.abs(out[:, 3] - theirs).max() <= 2e-5 * scale
        out[:, 3] = 0.0
        assert not out.any()

    def test_rejects_bad_input(self, host1d):
        with pytest.raises(ValueError, match="float32"):
            host1d.apply_strided(np.zeros(50, dtype=np.float64))
        with pytest.raises(ValueError, match="too short"):
            host1d.apply_strided(np.zeros(4, dtype=np.float32))
        with pytest.raises(ValueError, match="positive stride"):
            host1d.apply_strided(
                np.zeros(50, dtype=np.float32)[::-1])
        with pytest.raises(ValueError, match="len"):
            host1d.apply_strided(np.zeros(50, dtype=np.float32),
                                 out=np.zeros(40, dtype=np.float32))


class TestNative2DConveniences:
    """Native gradient/hessian/laplacian, mirroring the reference's
    analytic-field tests (/root/reference/test/iterative/
    test_savgol2d.c:362-502) plus a JAX-path cross-check."""

    def _field(self, rows=20, cols=24):
        y, x = np.mgrid[0:rows, 0:cols].astype(np.float32)
        return x, y

    def test_gradient_linear_field(self):
        x, y = self._field()
        img = 2.0 * x + 3.0 * y            # ref :362-401 analog
        gx, gy = native.gradient2d(img, 3, 3, 2,
                                   boundary=sg.Boundary2D.VALID)
        assert np.abs(gx - 2.0).max() <= 1e-4
        assert np.abs(gy - 3.0).max() <= 1e-4

    def test_hessian_quadratic_field(self):
        x, y = self._field()
        img = x * x + 4.0 * x * y + 3.0 * y * y   # ref :403-452 analog
        hxx, hxy, hyy = native.hessian2d(img, 4, 4, 3,
                                         boundary=sg.Boundary2D.VALID)
        assert np.abs(hxx - 2.0).max() <= 1e-3
        assert np.abs(hxy - 4.0).max() <= 1e-3
        assert np.abs(hyy - 6.0).max() <= 1e-3

    def test_laplacian_quadratic_field(self):
        x, y = self._field()
        img = x * x + y * y                 # ref :454-502 analog: lap = 4
        lap = native.laplacian2d(img, 3, 3, 2,
                                 boundary=sg.Boundary2D.VALID)
        assert np.abs(lap - 4.0).max() <= 1e-3

    @pytest.mark.parametrize("boundary", list(sg.Boundary2D))
    def test_matches_jax_conveniences(self, rng, boundary):
        img = rng.standard_normal((30, 40)).astype(np.float32)
        gx, gy = native.gradient2d(img, 3, 2, 3, boundary=boundary,
                                   n_threads=0)
        jgx, jgy = (np.asarray(a) for a in sg.savgol2d_gradient(
            jnp.asarray(img, dtype=F64), 3, 2, 3, boundary=boundary))
        scale = max(1.0, np.abs(jgx).max(), np.abs(jgy).max())
        assert np.abs(gx - jgx).max() <= 4e-6 * scale
        assert np.abs(gy - jgy).max() <= 4e-6 * scale
        lap = native.laplacian2d(img, 3, 2, 3, boundary=boundary)
        jlap = np.asarray(sg.savgol2d_laplacian(
            jnp.asarray(img, dtype=F64), 3, 2, 3, boundary=boundary))
        lscale = max(1.0, np.abs(jlap).max())
        assert np.abs(lap - jlap).max() <= 8e-6 * lscale

    def test_gradient_delta_scaling(self):
        x, y = self._field()
        img = 2.0 * x + 3.0 * y
        gx, gy = native.gradient2d(img, 3, 3, 2, delta_x=0.5, delta_y=2.0,
                                   boundary=sg.Boundary2D.VALID)
        assert np.abs(gx - 4.0).max() <= 1e-4
        assert np.abs(gy - 1.5).max() <= 1e-4

    def test_rejects_bad_config(self):
        img = np.zeros((10, 10), dtype=np.float32)
        with pytest.raises(ValueError):
            native.gradient2d(img, 1, 1, 0)     # deriv > order
        with pytest.raises(ValueError):
            native.laplacian2d(img, 1, 1, 1)    # deriv 2 > order 1


class TestStaticStream:
    """User-storage stream init — the reference's no-malloc path
    (/root/reference/src/savgol_stream.c:108-120)."""

    def test_matches_heap_stream(self, rng):
        cfg = sg.SavgolConfig(6, 3, 1)
        f = native.HostSavgol1D(cfg)
        heap = native.HostSavgolStream(f)
        stat = native.HostSavgolStream(f, static_storage=True)
        x = rng.standard_normal(200).astype(np.float32)
        a, b = [], []
        for v in x:
            a.extend(heap.push_full(float(v)).tolist())
            b.extend(stat.push_full(float(v)).tolist())
        a.extend(heap.flush().tolist())
        b.extend(stat.flush().tolist())
        assert a == b and len(a) == x.size
        assert stat.samples_received == x.size
        assert stat.samples_output == x.size

    def test_reset_and_reuse(self):
        stat = native.HostSavgolStream(sg.SavgolConfig(4, 2),
                                       static_storage=True)
        out1 = [stat.push_full(float(i)) for i in range(20)]
        stat.reset()
        assert stat.samples_received == 0 and not stat.ready
        out2 = [stat.push_full(float(i)) for i in range(20)]
        np.testing.assert_array_equal(np.concatenate(out1),
                                      np.concatenate(out2))


class TestApplyBatch:
    def test_matches_per_row_apply(self, rng):
        f = native.HostSavgol1D(sg.SavgolConfig(8, 3, 1))
        x = rng.standard_normal((7, 400)).astype(np.float32)
        want = np.stack([f.apply(r) for r in x])
        np.testing.assert_array_equal(f.apply_batch(x), want)
        np.testing.assert_array_equal(f.apply_batch(x, n_threads=0), want)
        np.testing.assert_array_equal(f.apply_batch(x, n_threads=3), want)

    def test_rejects_bad_shapes(self):
        f = native.HostSavgol1D(sg.SavgolConfig(8, 3))
        with pytest.raises(ValueError):
            f.apply_batch(np.zeros(100, dtype=np.float32))
        with pytest.raises(ValueError):
            f.apply_batch(np.zeros((2, 10), dtype=np.float32))
