"""1D bf16 throughput-mode attribution (VERDICT r03 weak #4).

README claims 56-60 Gs/s for ``method="bf16"`` against a ~182-205 Gs/s
bf16-in/out HBM bound (819 GB/s / ~4-4.5 B per sample) and a ~385 Gs/s
single-pass MXU bound (256 MACs/sample at ~98 TMAC/s) — ~30% of
roofline, unaccounted. This probe replays the 2D bf16 attribution
methodology: chained k-difference per stage, one process, with kernel
VARIANTS isolating each suspected cost:

  api          flt.apply(x_bf16, method="bf16")    (wrapper + kernel)
  kernel       savgol_polynomial_pallas_mxu direct  (bf16, DEFAULT prec)
  valid        correlate_valid_pallas_mxu direct    (no edge fixups)
  mm-only      variant: same grid/tiles/matmuls but NO slab concat
               (reuses the x block for both band inputs — wrong values,
               right cost). Kernel-vs-mm-only = the lane-relayout cost.
  copy         variant: o_ref[:] = x_ref[:] at same tiles — the pure
               HBM in+out floor Pallas can reach here (beware chained
               collapse: only quote if the k-ratio holds ~2).
  tiles        kernel at rows x cols in {128,256} x {1024,2048,4096}

Run ON TPU:  python benchmarks/probe_bf16_1d.py [--quick]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import savgol_tpu as sg
    from savgol_tpu.ops import pallas_conv as pc
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainlib import bench_chain

    quick = "--quick" in sys.argv
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B, N = (32, 262_144) if quick else (128, 1_048_576)
    n = 12
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.bfloat16)
    flt = sg.Savgol1D.create(sg.SavgolConfig(n, 4), dtype=jnp.float32)
    cw, ew = flt.center_weights, flt.edge_weights
    DEFAULT = jax.lax.Precision.DEFAULT

    def run(name, fn, x=x, k=16):
        fc = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(fc(x))
        comp = time.perf_counter() - t0
        per_step, ratio, _ = bench_chain(fn, x, iters=3, k=k,
                                         return_info=True)
        rate = x.size / per_step / 1e9
        flag = "" if 1.7 < ratio < 2.3 else "  [RATIO OFF - do not quote]"
        print(f"{name:22s} chained {rate:8.2f} Gs/s  (ratio {ratio:.2f})"
              f"  [compile {comp:.0f}s]{flag}", flush=True)
        return rate

    run("api bf16", lambda v: flt.apply(v, method="bf16"))
    run("kernel poly bf16", lambda v: pc.savgol_polynomial_pallas_mxu(
        v, cw, ew, n, 1.0, mxu_precision=DEFAULT))
    run("valid bf16", lambda v: jnp.pad(pc.correlate_valid_pallas_mxu(
        v, cw, mxu_precision=DEFAULT), ((0, 0), (n, n))))

    # ---- tile sweep on the poly kernel -------------------------------------
    for rows in (128, 256):
        for cols in (1024, 2048, 4096):
            try:
                run(f"kernel r{rows} c{cols}",
                    lambda v, r=rows, c=cols: pc.savgol_polynomial_pallas_mxu(
                        v, cw, ew, n, 1.0, rows=r, cols=c,
                        mxu_precision=DEFAULT))
            except Exception as e:  # noqa: BLE001
                print(f"kernel r{rows} c{cols} FAILED: {e}", flush=True)

    # ---- variants: isolate the slab concat and the HBM floor ---------------
    LANES = pc._LANES

    def mm_only_kernel(bands_ref, x_ref, o_ref, *, cb):
        # same matmul count/tiles as the real kernel, NO slab concat
        for i in range(cb):
            xs = jnp.concatenate(
                [x_ref[:, i * LANES:(i + 1) * LANES]] * 2, axis=1)
            o_ref[:, i * LANES:(i + 1) * LANES] = jax.lax.dot_general(
                xs, bands_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=DEFAULT,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def shift_only_kernel(x_ref, halo_ref, o_ref, *, cb):
        # the slab concat + a trivial per-block copy: relayout cost floor
        xsh = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
        for i in range(cb):
            o_ref[:, i * LANES:(i + 1) * LANES] = (
                xsh[:, i * LANES + n:(i + 1) * LANES + n])

    def copy_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]

    rows, cols = 128, 2048
    cb = cols // LANES
    bands = pc._valid_band_matrices(cw.astype(jnp.bfloat16))

    @jax.jit
    def mm_only(v):
        Bv, Nv = v.shape
        return pl.pallas_call(
            functools.partial(mm_only_kernel, cb=cb),
            grid=(Bv // rows, Nv // cols),
            in_specs=[pl.BlockSpec((2 * LANES, LANES), lambda bi, ci: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bv, Nv), v.dtype),
        )(bands, v)

    @jax.jit
    def shift_only(v):
        Bv, Nv = v.shape
        last128 = Nv // LANES - 1
        return pl.pallas_call(
            functools.partial(shift_only_kernel, cb=cb),
            grid=(Bv // rows, Nv // cols),
            in_specs=[pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, LANES),
                                   lambda bi, ci: (bi, jnp.minimum(
                                       (ci + 1) * cb, last128)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bv, Nv), v.dtype),
        )(v, v)

    @jax.jit
    def copy(v):
        Bv, Nv = v.shape
        return pl.pallas_call(
            copy_kernel,
            grid=(Bv // rows, Nv // cols),
            in_specs=[pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bv, Nv), v.dtype),
        )(v)

    run("mm-only (no concat)", mm_only)
    run("shift-only (no mm)", shift_only)
    run("copy floor", copy)


if __name__ == "__main__":
    main()
