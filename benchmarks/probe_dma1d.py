"""Manual-DMA double-buffered 1D banded-MXU kernel probe (VERDICT r2 #2/#3).

The production kernel (`_corr1d_mxu_call`) relies on Mosaic's automatic
BlockSpec pipeline; its measured plateau is ~31 Gs/s chained (~50%
effective MXU) with ~2.5 us/step non-overlapped, and lane-unaligned N
drops to ~16 Gs/s from partial (8,128)-tile DMAs. This probe implements
the ROADMAP's one unprobed lever: a hand-rolled pipeline —

  * 1D grid over row groups only; one kernel instance walks ALL column
    blocks, full-slab blocks via `fori_loop` + double-buffered explicit
    `pltpu.make_async_copy` (2 in-flight each way);
  * DMA extents must be static, so the (at most two) ragged tail blocks
    are unrolled in Python with their exact static widths — arbitrary N
    needs NO masking and NO partial-tile BlockSpec fetches: the tail
    DMA copies exactly the valid bytes into a pre-zeroed slab.

Correctness is asserted against the library path on every run (interpret
mode on CPU; real kernels on TPU). Timing uses distinct inputs per call
(the virtualized stack dedups identical dispatches).

Run:  python benchmarks/probe_dma1d.py [--bench] [--iters 10]
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

from savgol_tpu.ops.pallas_conv import (_LANES, _interpret_default,
                                        _valid_band_matrices, pl, pltpu)


def _corr1d_dma_kernel(bands_ref, x_hbm, o_hbm, in_buf, out_buf, in_sem,
                       out_sem, *, rows: int, cols: int, N: int,
                       n_out: int, mxu_precision):
    """One row-group instance; walks all column blocks with manual DMA.

    in_buf:  (2, rows, cols + 128) VMEM — slab double buffer
    out_buf: (2, rows, cols) VMEM — output double buffer
    """
    cb = cols // _LANES
    slab = cols + _LANES
    n_cblocks = -(-n_out // cols)
    # blocks whose slab [c*cols, c*cols+slab) fits inside [0, N]
    n_full = max(0, min(n_cblocks, (N - slab) // cols + 1))
    acc_t = jnp.float32
    V0 = bands_ref[0:_LANES]
    V1 = bands_ref[_LANES:2 * _LANES]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    r0 = pl.program_id(0) * rows

    def in_dma(slot, c, width=slab):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, rows), pl.ds(c * cols, width)],
            in_buf.at[slot, :, pl.ds(0, width)],
            in_sem.at[slot])

    def out_width(c):                       # static when c is static
        return min(n_out - c * cols, cols)

    def out_dma(slot, c, width=cols):
        return pltpu.make_async_copy(
            out_buf.at[slot, :, pl.ds(0, width)],
            o_hbm.at[pl.ds(r0, rows), pl.ds(c * cols, width)],
            out_sem.at[slot])

    def compute(slot):
        xw = in_buf[slot]
        for i in range(cb):
            xc = xw[:, i * _LANES:(i + 1) * _LANES]
            xr = xw[:, (i + 1) * _LANES:(i + 2) * _LANES]
            acc = mm(xc, V0) + mm(xr, V1)
            out_buf[slot, :, i * _LANES:(i + 1) * _LANES] = (
                acc.astype(out_buf.dtype))

    # ---- full-slab pipeline (all widths static = slab/cols) -------------
    if n_full > 0:
        in_dma(0, 0).start()

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_full)
            def _():
                in_dma(nxt, c + 1).start()

            in_dma(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            compute(slot)
            out_dma(slot, c).start()
            return 0

        jax.lax.fori_loop(0, n_full, body, 0)

    # ---- ragged tail (static widths; at most 2 blocks) ------------------
    pending = [c for c in (n_full - 2, n_full - 1) if c >= 0]
    for c in range(n_full, n_cblocks):
        slot = c % 2
        # retire the store that used this slot (issued 2 blocks ago)
        if c - 2 >= 0:
            out_dma(slot, c - 2, out_width(c - 2)).wait()
            pending.remove(c - 2)
        w_in = min(N - c * cols, slab)
        # zero the slab so the columns past N contribute exact zeros
        in_buf[slot] = jnp.zeros_like(in_buf[slot])
        in_dma(slot, c, w_in).start()
        in_dma(slot, c, w_in).wait()
        compute(slot)
        out_dma(slot, c, out_width(c)).start()
        pending.append(c)
    for c in pending:
        out_dma(c % 2, c, out_width(c)).wait()


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n_out",
                                             "interpret", "mxu_precision"))
def corr1d_dma_call(x, bands, rows, cols, n_out, interpret, mxu_precision):
    B, N = x.shape
    kernel = functools.partial(
        _corr1d_dma_kernel, rows=rows, cols=cols, N=N, n_out=n_out,
        mxu_precision=mxu_precision)
    grid = (B // rows,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _LANES, _LANES), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols + _LANES), x.dtype),
            pltpu.VMEM((2, rows, cols), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bands, x)


def run_correctness():
    from savgol_tpu.ops.pallas_conv import correlate_valid_pallas_mxu
    interpret = _interpret_default()
    rng = np.random.default_rng(0)
    for B, N, ws, cols in ((16, 4096, 25, 2048), (8, 5000, 25, 2048),
                           (16, 4333, 13, 1024), (8, 2100, 25, 2048)):
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws), dtype=jnp.float32)
        n_out = N - ws + 1
        bands = _valid_band_matrices(w)
        got = corr1d_dma_call(x, bands, rows=8, cols=cols, n_out=n_out,
                              interpret=interpret,
                              mxu_precision=jax.lax.Precision.HIGHEST)
        want = correlate_valid_pallas_mxu(x, w)
        err = float(jnp.abs(got - want).max())
        print(f"B={B} N={N} ws={ws} cols={cols}: max|d| vs library "
              f"{err:.3e}")
        assert err <= 1e-5, "manual-DMA kernel diverges"


def _bench_chain(fn, x, iters=5, k=4):
    """Chained on-device timing with k-difference (see probe_rowmxu):
    output fed back as next input, re-padded to length N."""
    N = x.shape[-1]

    def chained(v, kk):
        def body(carry, _):
            y = fn(carry)
            nxt = jnp.pad(y * jnp.asarray(1e-3, dtype=y.dtype),
                          ((0, 0), (0, N - y.shape[-1])))
            return nxt.astype(v.dtype), None
        out, _ = jax.lax.scan(body, v, None, length=kk)
        return out

    times = {}
    for kk in (k, 2 * k):
        cf = jax.jit(functools.partial(chained, kk=kk))
        out = cf(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = cf(out)
        jax.block_until_ready(out)
        times[kk] = (time.perf_counter() - t0) / iters
    ratio = times[2 * k] / times[k]
    if not (1.6 <= ratio <= 2.6):
        print(f"  !! k-scaling suspect: ratio {ratio:.2f}")
    return (times[2 * k] - times[k]) / k


def run_bench(iters):
    from savgol_tpu.ops.pallas_conv import correlate_valid_pallas_mxu
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(25), dtype=jnp.float32)
    bands = _valid_band_matrices(w)
    hp = jax.lax.Precision.HIGHEST
    for label, N in (("aligned  ", 1_048_576 + 24),
                     ("unaligned", 1_048_576 + 173)):
        # +24 keeps n_out = 2^20 exactly (lane-aligned); +173 leaves a
        # ragged tail
        B = 128
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
        n_out = N - 25 + 1
        t_lib = _bench_chain(
            lambda v: correlate_valid_pallas_mxu(v, w), x, iters=iters)
        print(f"{label} N={N}: library {B * n_out / t_lib / 1e9:6.2f} Gs/s")
        for rows, cols in ((128, 2048), (128, 4096), (256, 2048)):
            try:
                t_dma = _bench_chain(
                    lambda v, rows=rows, cols=cols: corr1d_dma_call(
                        v, bands, rows=rows, cols=cols, n_out=n_out,
                        interpret=False, mxu_precision=hp), x, iters=iters)
            except Exception as e:
                print(f"  dma[{rows}x{cols}] FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}")
                continue
            print(f"  dma[{rows}x{cols}] {B * n_out / t_dma / 1e9:6.2f} "
                  "Gs/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    run_correctness()
    if args.bench:
        assert jax.default_backend() == "tpu"
        run_bench(args.iters)
