"""Probe: stage attribution INSIDE savgol2d_apply_masked on TPU.

probe_masked2d_parts put the 65-stencil gram/rhs conv at ~56 ms on the
bench image, yet the full path walls at ~332 ms — attribute the rest:
pads, count, moveaxis, plane solve (via its standalone call), extract,
and the full composition.

Run ON TPU:  python benchmarks/probe_masked2d_stages.py
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

    from savgol_tpu.ops.apply2d import correlate2d_valid
    from savgol_tpu.ops.masked import (_masked_tables_2d,
                                       savgol2d_apply_masked)
    from savgol_tpu.ops.pallas_solve import plane_cholesky_solve

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    R = 1024
    nx = ny = 5
    m = 3
    wy = wx = 11
    Q3, Rinv, pair_w, pidx, mono = _masked_tables_2d(nx, ny, m)
    img = rng.standard_normal((R, R)).astype(np.float32)
    img[rng.random(img.shape) < 0.2] = np.nan
    imgj = jnp.asarray(img)
    mask = jnp.asarray(np.isfinite(img))

    def wall(name, fn, *args, iters=5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(fn)(*args))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        w = (time.perf_counter() - t0) / iters
        print(f"{name:28s} wall {w*1e3:9.2f} ms  [compile {comp:.0f}s]",
              flush=True)
        return w

    wall("full savgol2d_apply_masked",
         lambda v: savgol2d_apply_masked(
             v, half_window_x=nx, half_window_y=ny, poly_order=m,
             mask=mask, fill=0.0), imgj)

    # stages, composed incrementally
    dtype = jnp.float32
    wts = mask.astype(dtype)
    xz = jnp.where(mask, imgj, 0.0)
    pad = [(ny, ny), (nx, nx)]
    pw = jnp.asarray(pair_w, dtype)
    qw = jnp.asarray(Q3, dtype)

    def stage_pads(v):
        return jnp.pad(jnp.where(mask, v, 0.0), pad), jnp.pad(wts, pad)

    wall("pads only", stage_pads, imgj)

    def stage_gram(v):
        _, wpp = stage_pads(v)
        return correlate2d_valid(wpp, pw)

    wall("pads+gram conv (55)", stage_gram, imgj)

    def stage_rhs(v):
        xpp, _ = stage_pads(v)
        return correlate2d_valid(xpp, qw)

    wall("pads+rhs conv (10)", stage_rhs, imgj)

    gram = jax.jit(stage_gram)(imgj)
    rhs = jax.jit(stage_rhs)(imgj)
    gramP = jnp.moveaxis(gram, -3, 0)
    rhsP = jnp.moveaxis(rhs, -3, 0)
    quo = gramP[pidx[0, 0]] * (wy * wx) >= (10 - 0.5)

    wall("solve standalone",
         lambda g, r: plane_cholesky_solve(g, pidx, r, quo,
                                           rcond=1e-6)[0],
         gramP, rhsP)

    def stage_all_but_solve(v):
        xpp, wpp = stage_pads(v)
        g = jnp.moveaxis(correlate2d_valid(wpp, pw), -3, 0)
        r = jnp.moveaxis(correlate2d_valid(xpp, qw), -3, 0)
        return g.sum() + r.sum()

    wall("pads+both convs+moveaxis", stage_all_but_solve, imgj)


if __name__ == "__main__":
    main()
