"""Probe: masked-2D stage attribution — where do 332 ms/Mpix go?

probe_psolve.py cleared the plane-Cholesky kernel (k=10 solves at
16-23 Gpos/s), so the masked-2D wall must be the Gram/rhs CORRELATIONS:
65 dense 11x11 stencils against the mask/image at HIGHEST. This probe
times the candidates on the bench shape:

  xla-conv      correlate2d_valid (lax.conv, 65 output channels)
  stack-mxu     correlate2d_valid_pallas_rowmxu_stack in K-chunks
  sep-two-pass  separable tensor-basis form: 10 row-correlations of the
                mask + 55 column-correlations of those intermediates
                (1D convs; the pair stencils of a TENSOR-product
                orthonormal basis are rank-1 outer products)

Run ON TPU:  python benchmarks/probe_masked2d_parts.py
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
    from jax import lax

    from savgol_tpu.ops.apply2d import correlate2d_valid
    from savgol_tpu.ops.masked import _masked_tables_2d
    from savgol_tpu.ops import pallas_conv as pc

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    R = 1024
    nx = ny = 5
    m = 3
    Q3, Rinv, pair_w, pidx, mono = _masked_tables_2d(nx, ny, m)
    stencils = np.concatenate([pair_w, Q3])          # (65, 11, 11)
    K = stencils.shape[0]
    mask = (rng.random((R + 2 * ny, R + 2 * nx)) > 0.2).astype(np.float32)
    mj = jnp.asarray(mask)

    def wall(name, fn, *args, iters=5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        w = (time.perf_counter() - t0) / iters
        print(f"{name:22s} wall {w*1e3:9.2f} ms = "
              f"{R*R/w/1e6:8.1f} Mpix/s  [compile {comp:.0f}s]",
              flush=True)

    wj = jnp.asarray(stencils, jnp.float32)
    try:
        wall("xla-conv K=65", lambda v: correlate2d_valid(v, wj), mj)
    except Exception as e:  # noqa: BLE001
        print("xla-conv FAILED:", str(e)[:150])

    # K-chunked stack kernel (bands VMEM-bounded at ~4 stencils)
    def stack_chunked(v):
        outs = []
        for s in range(0, K, 4):
            outs.append(pc.correlate2d_valid_pallas_rowmxu_stack(
                v, stencils[s:s + 4]))
        return jnp.concatenate(outs, axis=0)

    try:
        wall("stack-mxu chunk4", stack_chunked, mj)
    except Exception as e:  # noqa: BLE001
        print("stack-mxu FAILED:", str(e)[:180])

    # separable two-pass with synthetic rank-1 stencils of the same
    # counts (10 x-factors, 55 (x,y) combinations + 10 rhs): 1D convs
    phix = np.linalg.qr(np.vander(
        (np.arange(2 * nx + 1) - nx) / nx, m + 1, increasing=True))[0]
    xpairs = np.stack([phix[:, a] * phix[:, b]
                       for a in range(m + 1) for b in range(a, m + 1)])
    ypairs = xpairs.copy()

    def sep_two_pass(v):
        B = v[None, None]                             # (1, 1, R+, C+)
        rowk = jnp.asarray(xpairs, jnp.float32).reshape(10, 1, 1, -1)
        inter = lax.conv_general_dilated(
            B, rowk, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)          # (1, 10, R+, C)
        # 55 column correlations: pick an x-plane per gram entry (use a
        # synthetic uniform mapping with the right COUNT)
        colk = jnp.asarray(ypairs, jnp.float32)
        outs = []
        for g in range(55):
            xp_ = inter[:, g % 10:g % 10 + 1]
            ck = colk[g % 10].reshape(1, 1, -1, 1)
            outs.append(lax.conv_general_dilated(
                xp_, ck, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=lax.Precision.HIGHEST))
        return jnp.concatenate(outs, axis=1)

    try:
        wall("sep two-pass 10+55", sep_two_pass, mj)
    except Exception as e:  # noqa: BLE001
        print("sep FAILED:", str(e)[:180])

    # grouped variant: ONE column conv with 55 channels from 10 planes
    def sep_grouped(v):
        B = v[None, None]
        rowk = jnp.asarray(xpairs, jnp.float32).reshape(10, 1, 1, -1)
        inter = lax.conv_general_dilated(
            B, rowk, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        # gather the 55 needed (xplane, ykernel) combos as one conv with
        # input-feature = 10 and a sparse (55, 10, wy, 1) kernel
        ck = np.zeros((55, 10, 2 * ny + 1, 1), np.float32)
        for g in range(55):
            ck[g, g % 10, :, 0] = ypairs[g % 10]
        return lax.conv_general_dilated(
            inter, jnp.asarray(ck), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)

    try:
        wall("sep grouped 10->55", sep_grouped, mj)
    except Exception as e:  # noqa: BLE001
        print("sep grouped FAILED:", str(e)[:180])


if __name__ == "__main__":
    main()
