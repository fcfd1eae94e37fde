"""Per-term profiling of the 2D bf16 row-banded MXU kernel (VERDICT r2 #1).

The kernel's own accounting promised ~28 Gpix/s theoretical; BENCH_r02
measured 9.5 through the API. Variants differ in exactly one term:

  A_lib       the library kernel body (output-side sublane-shifted adds)
  B_alignctl  shifts removed (part = rk[:r]) — WRONG numerics, isolates
              the cost of the output-side f32 relayouts
  C_inshift   shift moved to the bf16 INPUT operand (valid numerics):
              acc += xw[k:k+rows][block] @ B_k — aligned f32 adds, and
              the matmul M drops from rows+32 to rows
  C_wh1       C with a 1-row stencil (same matmul shapes, 1/11 the
              matmuls) — pure matmul-rate yardstick for the roofline

Timing protocol: every call gets a DISTINCT input (iteration-indexed add
folded in) — the virtualized dev stack dedups repeated identical
dispatches and reports impossible rates otherwise (ROADMAP measurement
pitfalls; observed: 3209 "Gpix/s" for repeated identical calls).

Run ON TPU:  python benchmarks/probe_rowmxu.py [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.ops.pallas_conv import (_LANES, _HALO_R, _round_up,
                                        _rowband_matrices, pl, pltpu)

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _bench_chain(fn, xp, *rest, iters=5, k=4):
    """Chained on-device k-difference timing (benchmarks/chainlib.py):
    each step's output is re-padded to the input geometry and fed back."""
    Rp, Cp = xp.shape[-2:]

    def fb(y, template):
        nxt = jnp.pad(y * jnp.asarray(1e-3, dtype=y.dtype),
                      ((0, 0), (0, Rp - y.shape[1]),
                       (0, Cp - y.shape[2])))
        return nxt.astype(template.dtype)

    return bench_chain(fn, xp, *rest, iters=iters, k=k, feedback=fb)


def _variant_kernel(bands_ref, x_ref, right_ref, bot_ref, corner_ref,
                    o_ref, *, wh: int, cb: int, variant: str):
    top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
    bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    r = o_ref.shape[1]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    for i in range(cb):
        if variant in ("A_lib", "B_alignctl"):
            X2 = xw[:, i * _LANES:i * _LANES + 2 * _LANES]
            acc = None
            for k in range(wh):
                rk = mm(X2, bands_ref[k])
                part = rk[k:k + r, :] if variant == "A_lib" else rk[:r, :]
                acc = part if acc is None else acc + part
        elif variant == "C_inshift":
            acc = None
            for k in range(wh):
                Xk = xw[k:k + r, i * _LANES:i * _LANES + 2 * _LANES]
                part = mm(Xk, bands_ref[k])
                acc = part if acc is None else acc + part
        else:
            raise ValueError(variant)
        o_ref[0, :, i * _LANES:(i + 1) * _LANES] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "variant"))
def _variant_call(xpad, bands, rows, cols, variant):
    B, Rp, Cp = xpad.shape
    out_r = Rp - _HALO_R
    out_c = Cp - _LANES
    wh = bands.shape[0]
    grid = (B, out_r // rows, out_c // cols)
    kernel = functools.partial(_variant_kernel, wh=wh, cb=cols // _LANES,
                               variant=variant)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((wh, 2 * _LANES, _LANES),
                         lambda b, ri, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, _LANES),
                         lambda b, ri, ci: (b, ri,
                                            (ci + 1) * (cols // _LANES)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HALO_R, cols),
                         lambda b, ri, ci: (b, (ri + 1) * (rows // _HALO_R),
                                            ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HALO_R, _LANES),
                         lambda b, ri, ci: (b, (ri + 1) * (rows // _HALO_R),
                                            (ci + 1) * (cols // _LANES)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cols),
                               lambda b, ri, ci: (b, ri, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_r, out_c), xpad.dtype),
        interpret=False,
    )(bands, xpad, xpad, xpad, xpad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "probe is a hardware measurement"

    from savgol_tpu.ops.weights import savgol2d_weights_np
    from savgol_tpu.config import Savgol2DConfig

    rng = np.random.default_rng(0)
    w = savgol2d_weights_np(Savgol2DConfig(5, 5, 3), dtype=np.float32)
    wh, ww = w.shape
    Bimg, R, C = 16, 2048, 2048
    img = jnp.asarray(rng.standard_normal((Bimg, R, C)), dtype=jnp.bfloat16)

    out_r, out_c = R - wh + 1, C - ww + 1
    npix = Bimg * out_r * out_c
    bands = jnp.asarray(_rowband_matrices(w.astype(np.float32)),
                        dtype=jnp.bfloat16)
    bands1 = bands[5:6]  # single stencil row (the center one)

    def padded(rows, cols):
        Rp = _round_up(out_r, rows) + _HALO_R
        Cp = _round_up(out_c, cols) + _LANES
        return jnp.pad(img, ((0, 0), (0, Rp - R), (0, Cp - C)))

    ref = None
    cases = [
        ("A_oldlib    256x512", "A_lib", 256, 512, bands),
        ("B_alignctl  256x512", "B_alignctl", 256, 512, bands),
        ("C_inshift   256x512", "C_inshift", 256, 512, bands),
        ("C_inshift  256x1024", "C_inshift", 256, 1024, bands),
        ("C_wh1       256x512", "C_inshift", 256, 512, bands1),
    ]
    for label, variant, rows, cols, bnd in cases:
        xp = padded(rows, cols)
        fn = functools.partial(_variant_call, rows=rows, cols=cols,
                               variant=variant)
        try:
            t = _bench_chain(fn, xp, bnd, iters=args.iters)
        except Exception as e:
            print(f"{label}  FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        y = np.asarray(fn(xp[:1], bnd)[0, :64, :64], dtype=np.float32)
        if ref is None:
            ref = y
        err = float(np.abs(y - ref).max())
        macs = bnd.shape[0] * 2 * _LANES
        print(f"{label}  {npix / t / 1e9:7.2f} Gpix/s   "
              f"mxu {npix / t * macs / 1e12:6.1f} TMAC/s   "
              f"max|d vs A| {err:.3e}")

    # library kernel (new input-shift form) through the same chain
    from savgol_tpu.ops.pallas_conv import _corr2d_rowmxu_call
    xp = padded(256, 512)
    t = _bench_chain(
        lambda v, b: _corr2d_rowmxu_call(v, b, 256, 512, False,
                                         jax.lax.Precision.DEFAULT),
        xp, bands, iters=args.iters)
    print(f"lib_new     256x512  {npix / t / 1e9:7.2f} Gpix/s")

    # API wrapper (same-size, fused pad) through the chain: output is
    # same-size so re-padding only restores the tiny boundary ring
    import savgol_tpu as sg
    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)

    def api_chain(v):
        def body(carry, _):
            y = f2.apply(carry, method="bf16")
            return (y * jnp.asarray(1e-3, dtype=y.dtype)).astype(v.dtype), None
        out, _ = jax.lax.scan(body, v, None, length=4)
        return out

    cf = jax.jit(api_chain)
    out = cf(img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = cf(out)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / (args.iters * 4)
    print(f"api_same    (chain)  {Bimg * R * C / t / 1e9:7.2f} Gpix/s")


if __name__ == "__main__":
    main()
