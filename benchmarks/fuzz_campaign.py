"""Offline fuzz campaign: high-volume randomized parity across the surface.

The committed fuzz lanes (tests/test_fuzz_parity.py, tests/test_sharded.py,
tests/test_scipy_compat.py) pin ~100 deterministic cases so the suite stays
fast. This driver samples the SAME contracts at campaign volume with a
fresh seed each run — hundreds of cases per lane against the compiled
reference C, the native C++ engine, scipy, exact mathematics, and the
single-device path. Any failure found here gets distilled into a committed
regression test.

    python benchmarks/fuzz_campaign.py --seed 1 --cases 200 [--lanes 1d,2d]

Exit code 0 = all lanes clean; 1 = failures (printed per case).
Run from the repo root (imports tests/conftest.py for the reference
oracle; that import forces CPU + x64 + 8 virtual devices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import ReferenceOracle, _build_reference_so  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import savgol_tpu as sg  # noqa: E402
from savgol_tpu import native  # noqa: E402

F64 = jnp.float64


def _sample_1d(rng):
    n = int(rng.integers(1, 33))
    m = int(rng.integers(0, min(2 * n, 11)))
    d = int(rng.integers(0, min(m, 4) + 1))
    boundary = rng.choice(list(sg.BoundaryMode))
    N = int(rng.integers(2 * n + 1, 8000))
    return n, m, d, boundary, N


def lane_1d(rng, cases, ref):
    """Three-way 1D parity: JAX f64 vs native C++ vs compiled reference,
    plus the VALID mode and random dt on a subset."""
    fails = []
    for _ in range(cases):
        n, m, d, boundary, N = _sample_1d(rng)
        dt = float(rng.choice([1.0, 0.25, 2.0])) if d else 1.0
        x = rng.standard_normal(N).astype(np.float32)
        cfg = sg.SavgolConfig(n, m, d, time_step=dt, boundary=boundary)
        f = sg.Savgol1D.create(cfg, dtype=F64)
        ours = np.asarray(f.apply(jnp.asarray(x, dtype=F64),
                                  reference_edge_sign=True))
        scale = max(1.0, np.abs(ours).max())
        got_native = native.HostSavgol1D(cfg).apply(
            x, reference_edge_sign=True)
        theirs = ref.apply(x, n, m, d, boundary=boundary.name.lower(),
                           time_step=dt)
        err_n = np.abs(got_native - ours).max() / scale
        err_r = np.abs(theirs - ours).max() / scale
        if err_n > 4e-6 or err_r > 2e-4:
            fails.append(dict(lane="1d", case=(n, m, d, boundary.name, N, dt),
                              err_native=float(err_n), err_ref=float(err_r)))
        if N >= 2 * (2 * n + 1):          # VALID-mode parity on a subset
            v_ours = np.asarray(f.apply_valid(jnp.asarray(x, dtype=F64)))
            v_ref = ref.apply_valid(x, n, m, d, time_step=dt)
            err_v = np.abs(v_ref - v_ours).max() / scale
            if v_ours.shape != v_ref.shape or err_v > 2e-4:
                fails.append(dict(lane="1d-valid",
                                  case=(n, m, d, boundary.name, N, dt),
                                  err=float(err_v)))
    return fails


def lane_2d(rng, cases, ref):
    """2D parity: JAX f64 vs native C++ 2D vs compiled reference."""
    fails = []
    done = 0
    while done < cases:
        hx = int(rng.integers(1, 17))
        hy = int(rng.integers(1, 17))
        order = int(rng.integers(0, 7))
        if (2 * hx + 1) * (2 * hy + 1) < (order + 1) * (order + 2) // 2:
            continue
        pool = [(dx, dy) for dx in range(order + 1)
                for dy in range(order + 1) if dx + dy <= order]
        dx, dy = pool[int(rng.integers(0, len(pool)))]
        boundary = rng.choice(list(sg.Boundary2D))
        R = int(rng.integers(2 * hy + 1, 96))
        C = int(rng.integers(2 * hx + 1, 96))
        cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
        img = rng.standard_normal((R, C)).astype(np.float32)
        try:
            f = sg.Savgol2D.create(cfg, dtype=F64)
        except np.linalg.LinAlgError:
            # must be a genuinely ill-posed functional — adjudicate
            # against exact rational arithmetic (the reference's unpivoted
            # Cholesky behavior on singular systems is rounding luck)
            from tests.test_weights import illposed_2d_exact
            if not illposed_2d_exact(hx, hy, order, dx, dy):
                fails.append(dict(lane="2d-reject",
                                  case=(hx, hy, order, dx, dy)))
            continue
        done += 1
        from tests.test_fuzz_parity import _design_rank_deficient
        rank_def = _design_rank_deficient(hx, hy, order)
        if rank_def:
            # accepted despite a singular design: the target must be
            # exactly identifiable
            from tests.test_weights import illposed_2d_exact
            if illposed_2d_exact(hx, hy, order, dx, dy):
                fails.append(dict(lane="2d-accept",
                                  case=(hx, hy, order, dx, dy)))
                continue
        ours = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                                  boundary=boundary))
        scale = max(1.0, np.abs(ours).max())
        got_native = native.HostSavgol2D(cfg).apply(img, boundary)
        err_n = np.abs(got_native - ours).max() / scale
        # f32 conv accumulation; up to 33x33 taps at the campaign's
        # hw<=16 (the committed lane's 4e-6 covers 17x17)
        if err_n > 1e-5:
            fails.append(dict(lane="2d-native",
                              case=(hx, hy, order, dx, dy,
                                    boundary.name, R, C),
                              err=float(err_n)))
        if rank_def:
            continue  # the reference's unpivoted-Cholesky result on a
            # singular (but well-posed) system is luck-of-rounding —
            # documented divergence, nothing to compare
        theirs = ref.apply2d(img, hx, hy, order, deriv_x=dx, deriv_y=dy,
                             boundary=boundary.name.lower())
        if theirs is None:
            continue  # reference's stricter Cholesky refused — documented
        err_r = np.abs(theirs - ours).max() / scale
        # the reference solves its normal equations in double but stores
        # f32 weights; high-order big-window configs drift accordingly
        if err_r > 5e-4:
            fails.append(dict(lane="2d",
                              case=(hx, hy, order, dx, dy,
                                    boundary.name, R, C),
                              err_ref=float(err_r)))
    return fails


def lane_scipy(rng, cases):
    """scipy.signal.savgol_filter drop-in parity over all modes/axes."""
    from scipy.signal import savgol_filter as scipy_savgol
    from savgol_tpu.scipy_compat import savgol_filter
    fails = []
    for _ in range(cases):
        n = int(rng.integers(1, 26))
        wl = 2 * n + 1
        po = int(rng.integers(0, min(wl - 1, 13)))
        d = int(rng.integers(0, po + 1)) if po else 0
        mode = str(rng.choice(["interp", "mirror", "nearest", "wrap",
                               "constant"]))
        delta = float(rng.choice([1.0, 0.5, 3.0])) if d else 1.0
        cval = float(rng.integers(-3, 4))
        ndim = int(rng.integers(1, 3))
        if ndim == 1:
            shape, axis = (int(rng.integers(wl, 600)),), -1
        else:
            shape = (int(rng.integers(2, 6)), int(rng.integers(wl, 300)))
            axis = int(rng.choice([0, 1])) if shape[0] >= wl else 1
        x = rng.standard_normal(shape)
        want = scipy_savgol(x, wl, po, deriv=d, delta=delta, axis=axis,
                            mode=mode, cval=cval)
        got = np.asarray(savgol_filter(jnp.asarray(x, dtype=F64), wl, po,
                                       deriv=d, delta=delta, axis=axis,
                                       mode=mode, cval=cval))
        scale = max(1.0, np.abs(want).max())
        err = np.abs(got - want).max() / scale
        # scipy's own lstsq drifts at high polyorder (adjudicated against
        # exact rationals — tests/test_fuzz_parity.py scipy lane): tight
        # for po <= 7, loose above (still catches O(1) mode/axis/sign bugs)
        tol = 1e-8 if po <= 7 else 1e-4
        if err > tol:
            fails.append(dict(lane="scipy",
                              case=(wl, po, d, mode, delta, cval, shape,
                                    axis),
                              err=float(err)))
    return fails


def lane_stream(rng, cases, ref):
    """Streaming three-way parity: JAX shell vs native vs reference
    (conservation: outputs == inputs after flush), against the batch
    output of matching leading-edge sign."""
    fails = []
    for _ in range(cases):
        n = int(rng.integers(1, 17))
        m = int(rng.integers(0, min(2 * n, 11)))
        d = int(rng.integers(0, min(m, 4) + 1))
        N = int(rng.integers(2 * n + 1, 1200))
        cfg = sg.SavgolConfig(n, m, d)
        x = rng.standard_normal(N).astype(np.float32)

        engine = native.HostSavgol1D(cfg)
        batch = engine.apply(x)
        batch_refsign = engine.apply(x, reference_edge_sign=True)
        scale = max(1.0, np.abs(batch).max())

        s = sg.SavgolStream(cfg)
        ours = [v for smp in x for v in s.push_full(float(smp))]
        ours = np.asarray(ours + list(s.flush()), dtype=np.float32)
        hs = native.HostSavgolStream(cfg)
        got = [v for smp in x for v in hs.push_full(float(smp))]
        got = np.asarray(got + list(hs.flush()), dtype=np.float32)
        theirs = np.asarray(ref.stream_run(x, n, m, d), dtype=np.float32)

        for name, y, base, tol in (("jax", ours, batch, 4e-6),
                                   ("native", got, batch, 4e-6),
                                   ("ref", theirs, batch_refsign, 2e-4)):
            if y.size != N:
                fails.append(dict(lane="stream", impl=name,
                                  case=(n, m, d, N), err="conservation"))
                continue
            err = np.abs(y - base).max() / scale
            if err > tol:
                fails.append(dict(lane="stream", impl=name,
                                  case=(n, m, d, N), err=float(err)))
    return fails


def lane_sharded(rng, cases):
    """Random sharded configs vs single device (1D + 2D, both halos)."""
    from savgol_tpu.parallel.sharded import apply_sharded, make_mesh
    from savgol_tpu.parallel.sharded2d import apply2d_sharded
    fails = []
    for _ in range(cases):
        if rng.random() < 0.5:
            n, m, d, boundary, _ = _sample_1d(rng)
            seq = int(rng.choice([2, 4, 8]))
            halo = str(rng.choice(["ppermute", "rdma"]))
            L = int(rng.integers(2 * n + 1, 500))
            B = int(rng.integers(1, 5))
            mesh = make_mesh(("seq",), shape=(seq,),
                             devices=jax.devices()[:seq])
            x = jnp.asarray(rng.standard_normal((B, seq * L)), dtype=F64)
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
            got = np.asarray(apply_sharded(
                x, f.center_weights, f.edge_weights, half_window=n,
                mesh=mesh, boundary=boundary, dt_inv=f.dt_inv,
                derivative=d, halo=halo))
            want = np.asarray(f.apply(x, boundary=boundary))
            if np.abs(got - want).max() > 1e-12:
                fails.append(dict(lane="sharded-1d",
                                  case=(n, m, d, boundary.name, seq, B, L,
                                        halo),
                                  err=float(np.abs(got - want).max())))
        else:
            hx = int(rng.integers(1, 9))
            hy = int(rng.integers(1, 9))
            order = int(rng.integers(0, 5))
            if ((2 * hx + 1) * (2 * hy + 1)
                    < (order + 1) * (order + 2) // 2):
                continue
            boundary = rng.choice([sg.Boundary2D.CONSTANT,
                                   sg.Boundary2D.REFLECT,
                                   sg.Boundary2D.PERIODIC,
                                   sg.Boundary2D.VALID])
            seq = int(rng.choice([2, 4, 8]))
            halo = str(rng.choice(["ppermute", "rdma"]))
            R = seq * int(rng.integers(max(2 * hy + 1, 8), 32))
            C = int(rng.integers(2 * hx + 1, 80))
            try:
                f2 = sg.Savgol2D.create(sg.Savgol2DConfig(hx, hy, order),
                                        dtype=F64)
            except np.linalg.LinAlgError:
                continue
            mesh = make_mesh(("seq",), shape=(seq,),
                             devices=jax.devices()[:seq])
            img = jnp.asarray(rng.standard_normal((R, C)), dtype=F64)
            got = np.asarray(apply2d_sharded(img, f2.weights, mesh=mesh,
                                             boundary=boundary,
                                             scale=f2.scale, halo=halo))
            want = np.asarray(f2.apply(img, boundary=boundary))
            if np.abs(got - want).max() > 1e-12:
                fails.append(dict(lane="sharded-2d",
                                  case=(hx, hy, order, boundary.name, seq,
                                        R, C, halo),
                                  err=float(np.abs(got - want).max())))
    return fails


def lane_property(rng, cases):
    """Mathematics: a degree-q<=m polynomial is an exact fixed point of
    the LS fit, so the filter must return its exact d-th derivative at
    every output, edges included (same setup and tolerance model as
    tests/test_apply.py::test_polynomial_reproduction_fuzz)."""
    fails = []
    for _ in range(cases):
        n = int(rng.integers(1, 33))
        m = int(rng.integers(0, min(2 * n, 11)))
        d = int(rng.integers(0, min(m, 4) + 1))
        q = int(rng.integers(d, m + 1))
        N = int(rng.integers(2 * n + 1, 800))
        h = 4.0 / N
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d, time_step=h),
                               dtype=F64)
        t = (np.arange(N) - N // 2) * h
        P = np.polynomial.Polynomial(rng.uniform(-1, 1, q + 1))
        want = P.deriv(d)(t) if d <= q else np.zeros_like(t)
        got = np.asarray(f.apply(jnp.asarray(P(t), dtype=F64)))
        tol = 1e-13 * (1.0 / h) ** d * max(1.0, np.abs(want).max())
        err = np.abs(got - want).max()
        if err > tol:
            fails.append(dict(lane="property", case=(n, m, d, q, N),
                              err=float(err), tol=float(tol)))
    return fails


def lane_grad(rng, cases):
    """Custom-VJP stress: gradients through the sharded paths (both halo
    implementations, 1D and 2D row-sharded, random batch dims, random
    cotangents) vs the single-device gradient."""
    from savgol_tpu.parallel.sharded import apply_sharded, make_mesh
    from savgol_tpu.parallel.sharded2d import apply2d_sharded
    fails = []
    for _ in range(cases):
        halo = str(rng.choice(["ppermute", "rdma"]))
        seq = int(rng.choice([2, 4, 8]))
        mesh = make_mesh(("seq",), shape=(seq,),
                         devices=jax.devices()[:seq])
        if rng.random() < 0.5:
            n = int(rng.integers(1, 17))
            m = int(rng.integers(0, min(2 * n, 11)))
            d = int(rng.integers(0, min(m, 4) + 1))
            boundary = rng.choice(list(sg.BoundaryMode))
            L = int(rng.integers(2 * n + 1, 200))
            B = int(rng.integers(1, 4))
            f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=F64)
            x = jnp.asarray(rng.standard_normal((B, seq * L)), dtype=F64)
            w = jnp.asarray(rng.standard_normal(x.shape), dtype=F64)
            g1 = np.asarray(jax.grad(lambda v: jnp.sum(w * apply_sharded(
                v, f.center_weights, f.edge_weights, half_window=n,
                mesh=mesh, boundary=boundary, dt_inv=f.dt_inv,
                derivative=d, halo=halo)))(x))
            g0 = np.asarray(jax.grad(lambda v: jnp.sum(
                w * f.apply(v, boundary=boundary)))(x))
            case = dict(lane="grad-1d",
                        case=(n, m, d, boundary.name, seq, B, L, halo))
        else:
            hx = int(rng.integers(1, 7))
            hy = int(rng.integers(1, 7))
            order = int(rng.integers(0, 4))
            if ((2 * hx + 1) * (2 * hy + 1)
                    < (order + 1) * (order + 2) // 2):
                continue
            boundary = rng.choice([sg.Boundary2D.CONSTANT,
                                   sg.Boundary2D.REFLECT,
                                   sg.Boundary2D.PERIODIC])
            R = seq * int(rng.integers(max(2 * hy + 1, 8), 24))
            C = int(rng.integers(2 * hx + 1, 48))
            try:
                f2 = sg.Savgol2D.create(sg.Savgol2DConfig(hx, hy, order),
                                        dtype=F64)
            except np.linalg.LinAlgError:
                continue
            x = jnp.asarray(rng.standard_normal((R, C)), dtype=F64)
            w = jnp.asarray(rng.standard_normal((R, C)), dtype=F64)
            g1 = np.asarray(jax.grad(lambda v: jnp.sum(w * apply2d_sharded(
                v, f2.weights, mesh=mesh, boundary=boundary,
                scale=f2.scale, halo=halo)))(x))
            g0 = np.asarray(jax.grad(lambda v: jnp.sum(
                w * f2.apply(v, boundary=boundary)))(x))
            case = dict(lane="grad-2d",
                        case=(hx, hy, order, boundary.name, seq, R, C,
                              halo))
        err = np.abs(g1 - g0).max() / max(1.0, np.abs(g0).max())
        if err > 1e-11:
            case["err"] = float(err)
            fails.append(case)
    return fails


def lane_sweep(rng, cases):
    """Parameter sweep vs per-config static applies (traced-weight path,
    masked windows) in f64."""
    from savgol_tpu.ops.sweep import savgol_apply_sweep
    fails = []
    for _ in range(cases):
        nc = int(rng.integers(1, 6))
        ns = rng.integers(1, 33, size=nc)
        ms = np.array([int(rng.integers(0, min(2 * n, 11))) for n in ns])
        d = int(rng.integers(0, min(ms.min(), 4) + 1)) if ms.min() else 0
        boundary = rng.choice(list(sg.BoundaryMode))
        B = int(rng.integers(1, 4))
        N = int(rng.integers(2 * ns.max() + 1, 4000))
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=F64)
        got = np.asarray(savgol_apply_sweep(
            x, jnp.asarray(ns), jnp.asarray(ms), derivative=d,
            boundary=boundary, dtype=F64))
        for ci, (n, m) in enumerate(zip(ns, ms)):
            f = sg.Savgol1D.create(sg.SavgolConfig(int(n), int(m), d),
                                   dtype=F64)
            want = np.asarray(f.apply(x, boundary=boundary))
            scale = max(1.0, np.abs(want).max())
            err = np.abs(got[ci] - want).max() / scale
            if err > 1e-9:
                fails.append(dict(lane="sweep",
                                  case=(int(n), int(m), d, boundary.name,
                                        B, N, nc),
                                  err=float(err)))
    return fails


def lane_bank(rng, cases):
    """SavgolBank (stacked one-pass filters) vs per-filter applies."""
    fails = []
    for _ in range(cases):
        n = int(rng.integers(1, 17))
        boundary = rng.choice(list(sg.BoundaryMode))
        K = int(rng.integers(1, 5))
        cfgs = []
        for _k in range(K):
            m = int(rng.integers(0, min(2 * n, 11)))
            d = int(rng.integers(0, min(m, 4) + 1))
            cfgs.append(sg.SavgolConfig(n, m, d, boundary=boundary))
        bank = sg.SavgolBank.create(cfgs, dtype=F64)
        B = int(rng.integers(1, 5))
        N = int(rng.integers(2 * n + 1, 3000))
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=F64)
        got = np.asarray(bank.apply(x))
        for ki, c in enumerate(cfgs):
            want = np.asarray(sg.Savgol1D.create(c, dtype=F64).apply(x))
            scale = max(1.0, np.abs(want).max())
            err = np.abs(got[ki] - want).max() / scale
            if err > 1e-11:
                fails.append(dict(lane="bank",
                                  case=(n, c.poly_order, c.derivative,
                                        boundary.name, K, B, N),
                                  err=float(err)))
    return fails


def lane_methods(rng, cases):
    """Method dispatch cross-checks on ONE config per case: xla (master)
    vs mxu / pallas (interpret off-TPU) / bf16-contract, plus axis moves,
    int promotion and complex split."""
    fails = []
    for _ in range(cases):
        n, m, d, boundary, _ = _sample_1d(rng)
        N = int(rng.integers(2 * n + 1, 2048))
        B = int(rng.integers(1, 5))
        f32 = jnp.float32
        f = sg.Savgol1D.create(sg.SavgolConfig(n, m, d), dtype=f32)
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=f32)
        base = np.asarray(f.apply(x, boundary=boundary, method="xla"))
        scale = max(1.0, np.abs(base).max())

        def check(name, y, tol):
            err = np.abs(np.asarray(y) - base).max() / scale
            if err > tol:
                fails.append(dict(lane="methods", impl=name,
                                  case=(n, m, d, boundary.name, B, N),
                                  err=float(err)))

        check("mxu", f.apply(x, boundary=boundary, method="mxu"), 2e-6)
        if N <= 1024:            # interpret-mode Pallas: keep cases small
            check("pallas", f.apply(x, boundary=boundary, method="pallas"),
                  2e-6)
            check("bf16", f.apply(x, boundary=boundary, method="bf16"),
                  5e-3)
        # axis handling: filter along a leading axis == transpose route
        check("axis0", jnp.moveaxis(
            f.apply(jnp.moveaxis(x, -1, 0), axis=0, boundary=boundary),
            0, -1), 1e-7)
        # complex input: real-linear split
        xc = x + 1j * jnp.asarray(rng.standard_normal((B, N)), dtype=f32)
        yc = np.asarray(f.apply(xc, boundary=boundary))
        base_i = np.asarray(f.apply(xc.imag, boundary=boundary))
        err_c = max(np.abs(yc.real - base).max(),
                    np.abs(yc.imag - base_i).max()) / scale
        if err_c > 1e-7:
            fails.append(dict(lane="methods", impl="complex",
                              case=(n, m, d, boundary.name, B, N),
                              err=float(err_c)))
        # int input promotion
        xi = jnp.asarray((x * 100).astype(np.int32))
        yi = np.asarray(f.apply(xi, boundary=boundary))
        want_i = np.asarray(f.apply(xi.astype(f32), boundary=boundary))
        if np.abs(yi - want_i).max() > 1e-7 * max(1.0, np.abs(want_i).max()):
            fails.append(dict(lane="methods", impl="int",
                              case=(n, m, d, boundary.name, B, N)))
    return fails


def lane_masked(rng, cases):
    """Missing-data lane: masked 1D (both solvers, bool + weighted masks)
    vs the per-window f64 lstsq oracle, and masked 2D vs the per-pixel
    oracle on small images. NaN placement must agree exactly."""
    from tests.test_masked import oracle_masked
    from tests.test_masked2d import oracle_masked2d
    from savgol_tpu import savgol_apply_masked, savgol2d_apply_masked

    def cmp(lane, got, want, tol, case):
        got, want = np.asarray(got), np.asarray(want)
        if not np.array_equal(np.isnan(got), np.isnan(want)):
            return dict(lane=lane, case=case, err="nan-placement")
        fin = ~np.isnan(want)
        if fin.any():
            scale = max(1.0, np.abs(want[fin]).max())
            err = np.abs(got[fin] - want[fin]).max() / scale
            if err > tol:
                return dict(lane=lane, case=case, err=float(err))
        return None

    fails = []
    for _ in range(cases):
        n = int(rng.integers(1, 13))
        m = int(rng.integers(0, min(2 * n, 7)))
        d = int(rng.integers(0, m + 1))
        dt = float(rng.choice([1.0, 0.5, 2.0])) if d else 1.0
        N = int(rng.integers(max(2 * n + 1, 8), 600))
        boundary = rng.choice(["truncate", sg.BoundaryMode.REFLECT,
                               sg.BoundaryMode.PERIODIC,
                               sg.BoundaryMode.CONSTANT])
        solver = str(rng.choice(["normal", "qr"]))
        x = rng.standard_normal(N)
        frac = float(rng.uniform(0.0, 0.4))
        k = int(frac * N)
        if k:
            x[rng.choice(N, k, replace=False)] = np.nan
        mk = np.isfinite(x)
        case = (n, m, d, dt, N, getattr(boundary, "name", boundary),
                solver, k)
        got = savgol_apply_masked(
            jnp.asarray(x, F64), half_window=n, poly_order=m, derivative=d,
            time_step=dt, boundary=boundary, solver=solver)
        want = oracle_masked(x, mk, n, m, d, dt,
                             None if boundary == "truncate" else boundary)
        r = cmp("masked-1d", got, want, 5e-7, case)
        if r:
            fails.append(r)
        # weighted fit on a subset: nonneg weights, zeros = the holes
        if rng.random() < 0.4:
            w = np.where(mk, rng.uniform(0.2, 3.0, N), 0.0)
            gw = savgol_apply_masked(
                jnp.asarray(np.where(mk, x, 0.0), F64), half_window=n,
                poly_order=m, derivative=d, time_step=dt,
                mask=jnp.asarray(w, F64), boundary="truncate",
                solver=solver)
            ww = _oracle_weighted_1d(x, w, n, m, d, dt)
            r = cmp("masked-1d-weighted", gw, ww, 5e-7, case)
            if r:
                fails.append(r)

    # 2D: the per-pixel Python oracle is slow — fewer, smaller cases
    for _ in range(max(1, cases // 8)):
        nx = int(rng.integers(1, 5))
        ny = int(rng.integers(1, 5))
        m = int(rng.integers(0, 4))
        if (2 * nx + 1) * (2 * ny + 1) < (m + 1) * (m + 2) // 2:
            continue
        pool = [(dx, dy) for dx in range(m + 1)
                for dy in range(m + 1) if dx + dy <= m]
        dx, dy = pool[int(rng.integers(0, len(pool)))]
        R = int(rng.integers(2 * ny + 1, 28))
        C = int(rng.integers(2 * nx + 1, 28))
        img = rng.standard_normal((R, C))
        k = int(rng.uniform(0.0, 0.3) * R * C)
        if k:
            img.reshape(-1)[rng.choice(R * C, k, replace=False)] = np.nan
        mk = np.isfinite(img)
        boundary = rng.choice(["truncate", sg.Boundary2D.REFLECT,
                               sg.Boundary2D.CONSTANT,
                               sg.Boundary2D.PERIODIC])
        case = (nx, ny, m, dx, dy, R, C,
                getattr(boundary, "name", boundary), k)
        got = savgol2d_apply_masked(
            jnp.asarray(img, F64), half_window_x=nx, half_window_y=ny,
            poly_order=m, deriv_x=dx, deriv_y=dy, boundary=boundary)
        want = oracle_masked2d(
            img, mk, nx, ny, m, dx, dy,
            boundary=None if boundary == "truncate" else boundary)
        # implementation may reject near-degenerate pixels the rank oracle
        # keeps — only flag value mismatches / oracle-NaN-but-we-emit
        gotv, wantv = np.asarray(got), np.asarray(want)
        bad_emit = np.isnan(wantv) & ~np.isnan(gotv)
        if bad_emit.any():
            fails.append(dict(lane="masked-2d", case=case,
                              err="emit-on-degenerate"))
            continue
        fin = ~np.isnan(wantv) & ~np.isnan(gotv)
        extra_nan = (np.isnan(gotv) & ~np.isnan(wantv)).mean()
        if extra_nan > 0.02:      # conservative rejections must stay rare
            fails.append(dict(lane="masked-2d", case=case,
                              err=f"over-reject {extra_nan:.3f}"))
        if fin.any():
            scale = max(1.0, np.abs(wantv[fin]).max())
            err = np.abs(gotv[fin] - wantv[fin]).max() / scale
            if err > 5e-7:
                fails.append(dict(lane="masked-2d", case=case,
                                  err=float(err)))
    return fails


def _oracle_weighted_1d(xv, w, n, m, d, dt):
    """Per-window weighted LS in f64 (truncate boundary)."""
    import math as _math
    xv = np.asarray(xv, dtype=np.float64)
    N = len(xv)
    xpad = np.pad(np.where(w > 0, xv, 0.0), n)
    wpad = np.pad(np.asarray(w, dtype=np.float64), n)
    out = np.full(N, np.nan)
    for p in range(N):
        js = np.arange(p, p + 2 * n + 1)
        ww = wpad[js]
        keep = ww > 0
        if keep.sum() < m + 1:
            continue
        u = (js[keep] - (p + n)) * dt
        A = np.vander(u, m + 1, increasing=True) * np.sqrt(ww[keep])[:, None]
        c, *_ = np.linalg.lstsq(A, xpad[js][keep] * np.sqrt(ww[keep]),
                                rcond=None)
        out[p] = c[d] * _math.factorial(d)
    return out


LANES = {"1d": lane_1d, "2d": lane_2d, "scipy": lane_scipy,
         "stream": lane_stream, "sharded": lane_sharded,
         "property": lane_property, "grad": lane_grad,
         "sweep": lane_sweep, "bank": lane_bank, "methods": lane_methods,
         "masked": lane_masked}
_NEEDS_REF = {"1d", "2d", "stream"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cases", type=int, default=200,
                    help="cases per lane (sharded/scipy/property run "
                         "cases//2 for runtime)")
    ap.add_argument("--lanes", type=str, default=",".join(LANES))
    args = ap.parse_args()

    ref = ReferenceOracle(_build_reference_so())
    failures = []
    for name in args.lanes.split(","):
        fn = LANES[name.strip()]
        rng = np.random.default_rng((args.seed << 8) ^ hash(name) & 0xFFFF)
        ncases = args.cases if name in ("1d", "2d") else args.cases // 2
        t0 = time.time()
        fl = fn(rng, ncases, ref) if name in _NEEDS_REF else fn(rng, ncases)
        print(f"[{name}] {ncases} cases, {len(fl)} failures, "
              f"{time.time() - t0:.0f}s", flush=True)
        failures.extend(fl)
    print(json.dumps({"seed": args.seed, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
