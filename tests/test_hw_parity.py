"""On-hardware parity gates for every fast path (SKIPPED off-TPU).

The CPU suite runs the Pallas kernels in interpreter mode only, so a
Mosaic lowering divergence would be invisible to it (precedent: the bf16
bank-edge corruption fixed in round 1 was caught only by ad-hoc hardware
checks). This module runs a compact grid of fast-path-vs-XLA-HIGHEST
comparisons on the real chip. Run with:

    SAVGOL_HW_TESTS=1 python -m pytest tests/test_hw_parity.py -q

(without the env var, tests/conftest.py forces the CPU platform for the
main suite, and this module skips itself.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import savgol_tpu as sg

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU hardware")

EXACT_TOL = 2e-5      # abs, standard-normal data (f32 paths vs XLA HIGHEST)
BF16_TOL = 5e-3       # the documented bf16 contract (relative)


def _rng(seed):
    return np.random.default_rng(seed)


class TestApply1D:
    @pytest.mark.parametrize("method", ["pallas", "mxu"])
    @pytest.mark.parametrize("boundary", list(sg.BoundaryMode))
    def test_exact_paths(self, method, boundary):
        x = jnp.asarray(_rng(1).standard_normal((8, 4096)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4, 1),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(x, boundary=boundary, method=method))
        want = np.asarray(f.apply(x, boundary=boundary, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_wide_batch_mxu_kernel(self):
        # B >= 64 drives the 2-band shifted-slab MXU kernel under auto
        x = jnp.asarray(_rng(2).standard_normal((128, 8192)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
        got = np.asarray(f.apply(x))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    @pytest.mark.parametrize("boundary", [sg.BoundaryMode.REFLECT,
                                          sg.BoundaryMode.PERIODIC,
                                          sg.BoundaryMode.CONSTANT])
    def test_wide_batch_fused_pad(self, boundary):
        # B >= 64 routes padded boundaries through the fused strip-splice
        # MXU kernel under auto
        x = jnp.asarray(_rng(6).standard_normal((64, 4096)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
        got = np.asarray(f.apply(x, boundary=boundary))
        want = np.asarray(f.apply(x, boundary=boundary, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_folded_thin_batch(self):
        x = jnp.asarray(_rng(3).standard_normal((2, 20000)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
        got = np.asarray(f.apply(x))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_bf16_contract(self):
        x = jnp.asarray(_rng(4).standard_normal((16, 4096)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
        got = np.asarray(f.apply(x, method="bf16"))
        want = np.asarray(f.apply(x, method="xla"))
        scale = max(1.0, float(np.abs(want).max()))
        assert np.abs(got - want).max() <= BF16_TOL * scale

    @pytest.mark.parametrize("n,m,d", [(1, 1, 0), (4, 3, 2), (32, 6, 1)])
    def test_config_corners(self, n, m, d):
        x = jnp.asarray(_rng(5).standard_normal((8, 2048)),
                        dtype=jnp.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(x))
        want = np.asarray(f.apply(x, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL


class TestApply2D:
    @pytest.mark.parametrize("method", ["pallas", "sep"])
    def test_exact_paths_valid(self, method):
        img = jnp.asarray(_rng(10).standard_normal((400, 600)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3),
                               dtype=jnp.float32)
        got = np.asarray(f.apply_valid(img, method=method))
        want = np.asarray(f.apply_valid(img, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    @pytest.mark.parametrize("boundary", [sg.Boundary2D.CONSTANT,
                                          sg.Boundary2D.REFLECT,
                                          sg.Boundary2D.PERIODIC])
    def test_same_size_fused_pad(self, boundary):
        img = jnp.asarray(_rng(11).standard_normal((300, 500)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(4, 6, 3),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, boundary=boundary))
        want = np.asarray(f.apply(img, boundary=boundary, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_small_stencil_5x5_large_image(self):
        # regression: 5x5 stencils at the default tiles blew Mosaic's
        # 16M scoped-VMEM cap on large images (more values stay live for
        # SMALL stencils); the const kernels now raise the cap
        img = jnp.asarray(_rng(15).standard_normal((2048, 2048)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(2, 2, 2),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img))
        want = np.asarray(f.apply(img[:256, :256], method="xla"))
        assert np.abs(got[:256, :256][6:-6, 6:-6]
                      - want[6:-6, 6:-6]).max() <= EXACT_TOL

    def test_wide_stencil_33(self):
        img = jnp.asarray(_rng(12).standard_normal((256, 512)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4),
                               dtype=jnp.float32)
        got = np.asarray(f.apply_valid(img))
        want = np.asarray(f.apply_valid(img, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    @pytest.mark.parametrize("hw", [5, 6, 8])
    def test_midband_rowmxu_dispatch_same_size(self, hw):
        # 11x11 / 13x13 / 17x17 windows route the exact path through the
        # row-banded MXU kernel at HIGHEST (apply2d._rowmxu_exact_band)
        img = jnp.asarray(_rng(16).standard_normal((300, 400)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(hw, hw, 3),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img))
        want = np.asarray(f.apply(img, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_midband_rowmxu_dispatch_valid_deriv(self):
        # VALID + derivative scale through the mid-band rowmxu route
        img = jnp.asarray(_rng(17).standard_normal((300, 400)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(
            sg.Savgol2DConfig(6, 6, 3, deriv_x=1, delta_x=0.5),
            dtype=jnp.float32)
        got = np.asarray(f.apply_valid(img))
        want = np.asarray(f.apply_valid(img, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_bf16_contract(self):
        img = jnp.asarray(_rng(13).standard_normal((256, 512)),
                          dtype=jnp.float32)
        f = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3),
                               dtype=jnp.float32)
        got = np.asarray(f.apply(img, method="bf16"))
        want = np.asarray(f.apply(img, method="xla"))
        scale = max(1.0, float(np.abs(want).max()))
        assert np.abs(got - want).max() <= BF16_TOL * scale

    def test_derivative_stack(self):
        img = jnp.asarray(_rng(14).standard_normal((256, 256)),
                          dtype=jnp.float32)
        gx, gy = sg.savgol2d_gradient(img, 4, 4, 3)
        gx_ref, gy_ref = sg.savgol2d_gradient(img, 4, 4, 3, method="xla")
        assert np.abs(np.asarray(gx) - np.asarray(gx_ref)).max() <= EXACT_TOL
        assert np.abs(np.asarray(gy) - np.asarray(gy_ref)).max() <= EXACT_TOL

    def test_hessian_midband_rowmxu(self):
        # hw=6 -> 13x13 stencils: the exact stack dispatches K per-stencil
        # rowmxu@HIGHEST launches (the ONE-stacked-pass form measured
        # 0.89-0.90x and was reverted, commit 9bee13b; the stacked kernel
        # remains on the bf16 path, covered below)
        img = jnp.asarray(_rng(18).standard_normal((256, 256)),
                          dtype=jnp.float32)
        got = sg.savgol2d_hessian(img, 6, 6, 3)
        want = sg.savgol2d_hessian(img, 6, 6, 3, method="xla")
        for a, b in zip(got, want):
            assert np.abs(np.asarray(a) - np.asarray(b)).max() <= EXACT_TOL


class TestBankSweepStream:
    def test_bank(self):
        bank = sg.SavgolBank.smooth_and_derivatives(12, 4, 2)
        x = jnp.asarray(_rng(20).standard_normal((8, 8192)),
                        dtype=jnp.float32)
        got = np.asarray(bank.apply(x))
        want = np.stack([np.asarray(
            sg.Savgol1D.create(sg.SavgolConfig(12, 4, d)).apply(
                x, method="xla")) for d in range(3)])
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_bank_wide_batch_mxu(self):
        # B >= 64 routes through the MXU bank kernel under auto
        bank = sg.SavgolBank.smooth_and_derivatives(12, 4, 2)
        x = jnp.asarray(_rng(23).standard_normal((64, 8192)),
                        dtype=jnp.float32)
        got = np.asarray(bank.apply(x))
        want = np.stack([np.asarray(
            sg.Savgol1D.create(sg.SavgolConfig(12, 4, d)).apply(
                x, method="xla")) for d in range(3)])
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_sweep(self):
        from savgol_tpu.ops.sweep import savgol_apply_sweep
        x = jnp.asarray(_rng(21).standard_normal(16384),
                        dtype=jnp.float32)
        ns = jnp.asarray([4, 12, 32])
        ms = jnp.asarray([2, 4, 6])
        got = np.asarray(savgol_apply_sweep(x, ns, ms))
        want = np.asarray(savgol_apply_sweep(x, ns, ms, method="xla"))
        assert np.abs(got - want).max() <= EXACT_TOL

    def test_chunked_stream_vs_batch(self):
        from savgol_tpu import stream as fstream
        flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4),
                                 dtype=jnp.float32)
        data = jnp.asarray(_rng(22).standard_normal((4, 8192)),
                           dtype=jnp.float32)
        st = fstream.chunk_init(12, jnp.float32)
        step = jax.jit(lambda st, ch: fstream.stream_process_chunk(
            st, ch, flt.center_weights, flt.edge_weights, flt.dt_inv))
        got = []
        for i in range(data.shape[0]):
            st, o, c = step(st, data[i])
            got.append(np.asarray(o)[:int(c)])
        got = np.concatenate(got)
        flat = data.reshape(-1)
        want = np.asarray(jax.jit(flt.apply)(flat))[:flat.size - 12]
        assert got.size == want.size
        assert np.abs(got - want).max() <= EXACT_TOL


def test_gradient_stack_bf16_contract():
    """The stacked rowmxu bf16 kernel compiles and holds its contract on
    hardware (one input pass for K stencils)."""
    img = jnp.asarray(_rng(30).standard_normal((512, 512)),
                      dtype=jnp.float32)
    gx, gy = sg.savgol2d_gradient(img, 4, 4, 2, method="bf16")
    rx, ry = sg.savgol2d_gradient(img, 4, 4, 2, method="xla")
    s = max(float(jnp.abs(rx).max()), float(jnp.abs(ry).max()), 1.0)
    e = max(float(jnp.abs(gx - rx).max()), float(jnp.abs(gy - ry).max()))
    assert e <= BF16_TOL * s


class TestMasked:
    """The masked normal-equation path rides the Pallas bank kernels on
    TPU; gate both kernel widths against the XLA comparator."""

    @pytest.mark.parametrize("B", [1, 128])   # VPU bank vs MXU bank
    def test_masked_bank_paths(self, B):
        rng = _rng(40 + B)
        x = rng.standard_normal((B, 4096)).astype(np.float32)
        holes = rng.random(x.shape) < 0.1
        x[holes] = np.nan
        kw = dict(half_window=8, poly_order=3, derivative=1)
        got = np.asarray(sg.savgol_apply_masked(jnp.asarray(x), **kw))
        want = np.asarray(sg.savgol_apply_masked(jnp.asarray(x),
                                                 method="xla", **kw))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        assert np.abs(got[fin] - want[fin]).max() <= EXACT_TOL

    def test_masked_qr_agrees(self):
        rng = _rng(43)
        x = rng.standard_normal((64, 2048)).astype(np.float32)
        x[rng.random(x.shape) < 0.08] = np.nan
        kw = dict(half_window=6, poly_order=2)
        got = np.asarray(sg.savgol_apply_masked(jnp.asarray(x),
                                                solver="qr", **kw))
        want = np.asarray(sg.savgol_apply_masked(jnp.asarray(x),
                                                 method="xla", **kw))
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        # interior windows are well-conditioned; qr vs normal differ by
        # solver rounding only
        assert np.abs(got[fin] - want[fin]).max() <= 1e-3

    def test_masked_2d(self):
        rng = _rng(45)
        img = rng.standard_normal((256, 256)).astype(np.float32)
        img[rng.random(img.shape) < 0.05] = np.nan
        got = np.asarray(sg.savgol2d_apply_masked(
            jnp.asarray(img), half_window_x=3, half_window_y=3,
            poly_order=2))
        # mathematics gate: masked order-0..2 fit of a constant is exact
        const = np.asarray(sg.savgol2d_apply_masked(
            jnp.ones((64, 64), jnp.float32) * 2.5, half_window_x=3,
            half_window_y=3, poly_order=2))
        assert np.isfinite(got).all()
        assert np.abs(const - 2.5).max() <= 1e-5

    def test_masked_2d_fused_vs_xla(self):
        # the fused tensor-moment kernel (the TPU default) vs the staged
        # XLA twin, flagship geometry, gated on well-covered windows
        # (hole-starved windows amplify the formulations' differing Gram
        # rounding by cond^2 — conditioning, not a Mosaic divergence)
        from scipy.ndimage import uniform_filter
        rng = _rng(46)
        img = rng.standard_normal((512, 512)).astype(np.float32)
        img[rng.random(img.shape) < 0.2] = np.nan
        kw = dict(half_window_x=5, half_window_y=5, poly_order=3,
                  deriv_x=1, fill=0.0)
        got = np.asarray(sg.savgol2d_apply_masked(jnp.asarray(img), **kw))
        want = np.asarray(sg.savgol2d_apply_masked(
            jnp.asarray(img), method="xla", **kw))
        cov = uniform_filter(np.isfinite(img).astype(float), size=11,
                             mode="constant") * 121
        well = cov >= 0.7 * 121
        assert np.abs(got - want)[well].max() <= 2e-4

    def test_masked_2d_fused_weighted_and_gradient(self):
        rng = _rng(47)
        img = rng.standard_normal((128, 256)).astype(np.float32)
        wts = rng.random(img.shape).astype(np.float32)
        wts[rng.random(wts.shape) < 0.15] = 0.0
        kw = dict(half_window_x=3, half_window_y=3, poly_order=2,
                  fill=0.0)
        got = np.asarray(sg.savgol2d_apply_masked(
            jnp.asarray(img), mask=jnp.asarray(wts), **kw))
        want = np.asarray(sg.savgol2d_apply_masked(
            jnp.asarray(img), mask=jnp.asarray(wts), method="xla", **kw))
        assert np.abs(got - want).max() <= 2e-3      # hole-starved incl.
        assert np.median(np.abs(got - want)) <= 1e-5
        g = jax.grad(lambda v: jnp.sum(sg.savgol2d_apply_masked(
            v, mask=jnp.asarray(wts), **kw) ** 2))(jnp.asarray(img))
        assert np.isfinite(np.asarray(g)).all()


class TestPlaneSolve:
    """The fused Pallas plane-Cholesky kernels (ops/pallas_solve.py) vs
    their jnp twins, same Gram/rhs planes on-chip — the dd kernel is
    hardware-only (interpret mode cannot run it), so THIS is its only
    executable correctness gate."""

    def _problem(self, k, pos, seed):
        rng = _rng(seed)
        kp = k * (k + 1) // 2
        pidx = np.zeros((k, k), np.int32)
        c = 0
        for a in range(k):
            for b in range(a, k):
                pidx[a, b] = pidx[b, a] = c
                c += 1
        A = rng.standard_normal((pos, 3 * k, k))
        G = np.einsum("nti,ntj->nij", A, A).astype(np.float32)
        gram = np.stack([G[:, a, b] for a in range(k) for b in
                         range(a, k)])
        rhs = rng.standard_normal((k, pos)).astype(np.float32)
        quo = rng.random(pos) > 0.05
        return (jnp.asarray(gram), pidx, jnp.asarray(rhs),
                jnp.asarray(quo))

    def test_plain_kernel_vs_twin(self):
        from savgol_tpu.ops.lsq import cholesky_solve_planes
        from savgol_tpu.ops.pallas_solve import _raw_plane_solve
        gram, pidx, rhs, quo = self._problem(5, 5000, 60)
        got, okg = _raw_plane_solve(gram, pidx, rhs, quo, rcond=None,
                                    interpret=False)
        want, okw = cholesky_solve_planes(gram, pidx, rhs, quo)
        assert np.array_equal(np.asarray(okg), np.asarray(okw))
        fin = np.asarray(okw)
        d = np.abs(np.asarray(got)[:, fin] - np.asarray(want)[:, fin])
        assert d.max() <= 1e-4 * max(1.0, np.abs(np.asarray(want)).max())

    def test_dd_kernel_vs_twin(self):
        from savgol_tpu.ops.lsq import cholesky_solve_planes_dd
        from savgol_tpu.ops.pallas_solve import _raw_plane_solve_dd
        gram, pidx, rhs, quo = self._problem(5, 5000, 61)
        glo = jnp.zeros_like(gram)
        rlo = jnp.zeros_like(rhs)
        got, okg = _raw_plane_solve_dd(gram, glo, pidx, rhs, rlo, quo,
                                       rcond=1e-6, interpret=False)
        want, okw = cholesky_solve_planes_dd(gram, glo, pidx, rhs, rlo,
                                             quo, rcond=1e-6)
        assert np.array_equal(np.asarray(okg), np.asarray(okw))
        fin = np.asarray(okw)
        d = np.abs(np.asarray(got)[:, fin] - np.asarray(want)[:, fin])
        assert d.max() <= 1e-4 * max(1.0, np.abs(np.asarray(want)).max())

    def test_dd_kernel_2d_width(self):
        # the 2D masked width: k = 10 terms, 55 Gram planes
        from savgol_tpu.ops.lsq import cholesky_solve_planes
        from savgol_tpu.ops.pallas_solve import _raw_plane_solve
        gram, pidx, rhs, quo = self._problem(10, 2000, 62)
        got, okg = _raw_plane_solve(gram, pidx, rhs, quo, rcond=1e-6,
                                    interpret=False)
        want, okw = cholesky_solve_planes(gram, pidx, rhs, quo,
                                          rcond=1e-6)
        assert np.array_equal(np.asarray(okg), np.asarray(okw))
        fin = np.asarray(okw)
        d = np.abs(np.asarray(got)[:, fin] - np.asarray(want)[:, fin])
        assert d.max() <= 1e-3 * max(1.0, np.abs(np.asarray(want)).max())


class TestNonuniform:
    """The non-uniform/resample paths ride the double-word moment planes
    and the hardware-only dd plane-Cholesky kernel on TPU — gate against
    the uniform fast path and the mathematics, same data on-chip."""

    def test_uniform_grid_matches_uniform_path(self):
        # On an exactly uniform grid the per-window LS fit must agree
        # with the classic (interior) filter output.
        x = jnp.asarray(_rng(50).standard_normal((4, 2048)),
                        dtype=jnp.float32)
        t = jnp.arange(2048, dtype=jnp.float32) * 0.25
        got = np.asarray(sg.savgol_apply_nonuniform(
            x, t, half_window=8, poly_order=3, derivative=1))
        f = sg.Savgol1D.create(sg.SavgolConfig(8, 3, 1, time_step=0.25),
                               dtype=jnp.float32)
        want = np.asarray(f.apply(x, method="xla"))
        sl = slice(8, -8)
        assert np.abs(got[:, sl] - want[:, sl]).max() <= 1e-4

    def test_resample_at_sample_positions(self):
        # Querying the sorted sample positions themselves reproduces the
        # non-uniform filter output at those positions.
        rng = _rng(51)
        t = np.sort(rng.uniform(0.0, 100.0, 1500)).astype(np.float32)
        x = np.sin(0.3 * t) + 0.1 * rng.standard_normal(1500)
        x = x.astype(np.float32)
        got = np.asarray(sg.savgol_resample(
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(t),
            half_window=6, poly_order=2))
        want = np.asarray(sg.savgol_apply_nonuniform(
            jnp.asarray(x), jnp.asarray(t), half_window=6, poly_order=2))
        sl = slice(6, -6)
        assert np.abs(got[sl] - want[sl]).max() <= 1e-4

    def test_resample_auto_vs_direct(self):
        # The recentered-plane resample (the default; rides the fused
        # coeff pipeline) vs the per-query-gather direct path — same
        # windows, same LS fit in a different basis — on-chip.
        rng = _rng(54)
        N = 32_768
        t = np.cumsum(0.5 + rng.random(N)).astype(np.float32)
        tq = np.linspace(t[0] - 2, t[-1] + 2, N // 2).astype(np.float32)
        x = rng.standard_normal((4, N)).astype(np.float32)
        x[rng.random(x.shape) < 0.1] = np.nan
        kw = dict(half_window=12, poly_order=4, derivative=1, fill=0.0)
        got = np.asarray(sg.savgol_resample(
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(tq), **kw))
        want = np.asarray(sg.savgol_resample(
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(tq),
            method="direct", **kw))
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() <= 1e-4 * scale

    def test_polynomial_reproduction_on_jittered_grid(self):
        # An order-<=m polynomial sampled at irregular positions is
        # reproduced exactly (to f32 LS rounding), derivative included.
        rng = _rng(52)
        t = np.cumsum(0.5 + rng.random(1024)).astype(np.float32)
        poly = 0.3 * t**2 - 1.7 * t + 4.0
        got = np.asarray(sg.savgol_apply_nonuniform(
            jnp.asarray(poly.astype(np.float32)), jnp.asarray(t),
            half_window=5, poly_order=2, derivative=1))
        want = 0.6 * t - 1.7
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 1e-4 * max(1.0, scale)

    def test_nonuniform_planes_kernel_vs_staged(self):
        # the emit_planes mode of the fused dd kernel (savgol_resample's
        # TPU fit stage) vs the staged _fit_coeffs twin, same data
        # on-chip: coefficient planes, normalizers and quorum mask
        from savgol_tpu.ops.nonuniform import _fit_coeffs, _staged_taps
        from savgol_tpu.ops.pallas_nonuniform import \
            savgol_nonuniform_planes_pallas
        rng = _rng(55)
        n, m = 12, 4
        t = np.cumsum(0.5 + rng.random((8, 8192)), axis=-1).astype(
            np.float32)
        x = rng.standard_normal((8, 8192)).astype(np.float32)
        x[rng.random(x.shape) < 0.1] = np.nan
        fin = np.isfinite(x)
        xz = jnp.asarray(np.where(fin, x, 0.0))
        wts = jnp.asarray(fin.astype(np.float32))
        tb = jnp.asarray(t)
        ck, sk, okk = savgol_nonuniform_planes_pallas(
            xz, wts, tb, half_window=n, poly_order=m, kmin=m + 1,
            rcond=1e-6)
        ct, st, okt = _fit_coeffs(_staged_taps(xz, wts, tb, n),
                                  2 * n + 1, m, m + 1, 1e-6, jnp.float32)
        okb = np.asarray(okt)
        assert bool(jnp.all((okk > 0.5) == okt))
        dc = np.abs(np.asarray(ck - ct))[:, okb]
        scale = max(1.0, float(np.abs(np.asarray(ct))[:, okb].max()))
        assert dc.max() <= 1e-5 * scale
        np.testing.assert_allclose(np.asarray(sk), np.asarray(st),
                                   rtol=1e-6)

    def test_nonuniform_fused_vs_xla(self):
        # the fused dd-moment kernel (the TPU default) vs the staged XLA
        # twin, same data on-chip, masked + derivative, flagship config
        rng = _rng(53)
        t = np.cumsum(0.5 + rng.random((8, 8192)), axis=-1).astype(
            np.float32)
        x = rng.standard_normal((8, 8192)).astype(np.float32)
        x[rng.random(x.shape) < 0.1] = np.nan
        kw = dict(half_window=12, poly_order=4, derivative=1, fill=0.0)
        got = np.asarray(sg.savgol_apply_nonuniform(
            jnp.asarray(x), jnp.asarray(t), **kw))
        want = np.asarray(sg.savgol_apply_nonuniform(
            jnp.asarray(x), jnp.asarray(t), method="xla", **kw))
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() <= 1e-4 * scale
        g = jax.grad(lambda v: jnp.sum(sg.savgol_apply_nonuniform(
            v, jnp.asarray(t), **kw) ** 2))(jnp.asarray(x))
        assert np.isfinite(np.asarray(g)).all()
