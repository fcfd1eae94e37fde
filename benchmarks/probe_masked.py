"""Probe: masked / nonuniform path throughput on TPU (chained protocol).

Round-4 measurement pass for the capability paths that previously had no
numbers (VERDICT r03 weak #3): masked 1D (normal + qr solvers), masked
2D, nonuniform, resample. Prints one line per case: Gs/s (or Gpix/s) via
the chained k-difference with its k-ratio, plus wall time per call.

Usage: python benchmarks/probe_masked.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from savgol_tpu.ops.masked import (savgol_apply_masked,
                                       savgol2d_apply_masked)
    from savgol_tpu.ops.nonuniform import (savgol_apply_nonuniform,
                                           savgol_resample)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainlib import bench_chain

    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    def run(name, fn, x, nsamples, k=4):
        t0 = time.perf_counter()
        fc = jax.jit(fn)
        y = jax.block_until_ready(fc(x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            y = fc(x)
        jax.block_until_ready(y)
        wall = (time.perf_counter() - t0) / 3
        per_step, ratio, _ = bench_chain(fn, x, iters=3, k=k,
                                         return_info=True)
        rate = nsamples / per_step / 1e9
        print(f"{name:28s} chained {rate:8.3f} G/s  (ratio {ratio:.2f})  "
              f"wall {wall*1e3:8.2f} ms = {nsamples/wall/1e9:7.3f} G/s  "
              f"[compile {compile_s:.0f}s]", flush=True)
        return rate

    # ---- masked 1D ---------------------------------------------------------
    B, N = (16, 65536) if quick else (64, 131072)
    x = rng.standard_normal((B, N)).astype(np.float32)
    holes = rng.random((B, N)) < 0.2
    x[holes] = np.nan
    xj = jnp.asarray(x)
    mask = jnp.asarray(np.isfinite(x))

    run("masked1d normal 20%holes",
        lambda v: savgol_apply_masked(
            v, half_window=12, poly_order=4, mask=mask, fill=0.0),
        xj, B * N)

    Bq = 4 if quick else 8
    xq = jnp.asarray(x[:Bq])
    maskq = mask[:Bq]
    run("masked1d qr 20%holes",
        lambda v: savgol_apply_masked(
            v, half_window=12, poly_order=4, mask=maskq, fill=0.0,
            solver="qr"),
        xq, Bq * N)

    # ---- masked 2D ---------------------------------------------------------
    R = 512 if quick else 1024
    img = rng.standard_normal((R, R)).astype(np.float32)
    imh = rng.random((R, R)) < 0.2
    img[imh] = np.nan
    imgj = jnp.asarray(img)
    mask2 = jnp.asarray(np.isfinite(img))
    run("masked2d hw5 o3 20%holes",
        lambda v: savgol2d_apply_masked(
            v, half_window_x=5, half_window_y=5, poly_order=3,
            mask=mask2, fill=0.0),
        imgj, R * R, k=2)

    # ---- nonuniform --------------------------------------------------------
    Bn = 2 if quick else 8
    t = np.cumsum(rng.random((Bn, N)).astype(np.float64) + 0.5, axis=-1)
    xn = jnp.asarray(rng.standard_normal((Bn, N)).astype(np.float32))
    tj = jnp.asarray(t.astype(np.float32))
    run("nonuniform n12 m4",
        lambda v: savgol_apply_nonuniform(
            v, tj, half_window=12, poly_order=4, fill=0.0),
        xn, Bn * N)

    # ---- resample ----------------------------------------------------------
    t1 = np.cumsum(rng.random(N).astype(np.float64) + 0.5)
    tq1 = np.linspace(t1[0], t1[-1], N)
    x1 = jnp.asarray(rng.standard_normal((Bn, N)).astype(np.float32))
    t1j = jnp.asarray(t1.astype(np.float32))
    tqj = jnp.asarray(tq1.astype(np.float32))
    run("resample n12 m4",
        lambda v: savgol_resample(
            v, t1j, tqj, half_window=12, poly_order=4, fill=0.0),
        x1, Bn * N)


if __name__ == "__main__":
    main()
