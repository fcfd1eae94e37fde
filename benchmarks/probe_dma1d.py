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

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.ops.pallas_conv import (_LANES, _valid_band_matrices,
                                        pl, pltpu)

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _corr1d_dma_kernel(bands_ref, tbands_ref, x_hbm, o_hbm, in_buf,
                       out_buf, in_sem, out_sem, *, rows: int, cols: int,
                       N: int, n_out: int, mxu_precision):
    """One row-group instance; walks all column blocks with manual DMA.

    Full-slab blocks stream through a double-buffered fori_loop pipeline.
    The ragged tail (any block whose slab would overrun N) is ONE
    overlapped block whose aligned-width window ENDS exactly at N; the
    static in-slab misalignment d = n_out + 128 - N - (n_full*cols -
    (N - s_w))... is folded into a second band pair built from the filter
    prepended with d zeros — so every DMA and every value slice stays
    128-aligned, with no masking and no relayouts (overlapped outputs are
    recomputed identically and harmlessly rewritten).

    in_buf:  (2, rows, cols + 3*128) VMEM — slab double buffer (extra
             lanes cover the tail geometry, whose aligned width can
             exceed cols by one lane block, plus the zero guard the
             shifted V1 band reads against zero band entries)
    out_buf: (2, rows, cols + 128) VMEM — output double buffer
    """
    cb = cols // _LANES
    slab = cols + _LANES
    n_cblocks = -(-n_out // cols)
    # blocks whose slab [c*cols, c*cols+slab) fits inside [0, N]
    n_full = max(0, min(n_cblocks, (N - slab) // cols + 1))
    acc_t = jnp.float32
    V0 = bands_ref[0:_LANES]
    V1 = bands_ref[_LANES:2 * _LANES]
    r0 = pl.program_id(0) * rows

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, rows), pl.ds(c * cols, slab)],
            in_buf.at[slot, :, pl.ds(0, slab)],
            in_sem.at[slot])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            out_buf.at[slot, :, pl.ds(0, cols)],
            o_hbm.at[pl.ds(r0, rows), pl.ds(c * cols, cols)],
            out_sem.at[slot])

    def compute(slot, b0, b1, nblk):
        xw = in_buf[slot]
        for i in range(nblk):
            xc = xw[:, i * _LANES:(i + 1) * _LANES]
            xr = xw[:, (i + 1) * _LANES:(i + 2) * _LANES]
            acc = mm(xc, b0) + mm(xr, b1)
            out_buf[slot, :, i * _LANES:(i + 1) * _LANES] = (
                acc.astype(out_buf.dtype))

    # ---- full-slab pipeline ---------------------------------------------
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

            compute(slot, V0, V1, cb)
            out_dma(slot, c).start()
            return 0

        jax.lax.fori_loop(0, n_full, body, 0)
        if n_full >= 2:
            out_dma(n_full % 2, n_full - 2).wait()
        out_dma((n_full - 1) % 2, n_full - 1).wait()

    # ---- overlapped aligned tail (one block; static geometry) -----------
    tw = n_out - n_full * cols
    if tw > 0:
        wo_up = -(-tw // _LANES) * _LANES          # aligned out width
        s_w = wo_up + _LANES                        # aligned slab width
        # in-slab offset of the first tail output's window start,
        # folded into tbands (bands of [0]*d + w)
        slot = 0
        # zero the +128 guard lanes once (V1's shifted rows read them
        # multiplied by zero band entries; the DMA covers [0, s_w))
        in_buf[slot] = jnp.zeros_like(in_buf[slot])
        tin = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, rows), pl.ds(N - s_w, s_w)],
            in_buf.at[slot, :, pl.ds(0, s_w)],
            in_sem.at[slot])
        tin.start()
        tin.wait()
        T0 = tbands_ref[0:_LANES]
        T1 = tbands_ref[_LANES:2 * _LANES]
        compute(slot, T0, T1, wo_up // _LANES)
        tout = pltpu.make_async_copy(
            out_buf.at[slot, :, pl.ds(0, wo_up)],
            o_hbm.at[pl.ds(r0, rows), pl.ds(n_out - wo_up, wo_up)],
            out_sem.at[slot])
        tout.start()
        tout.wait()


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n_out",
                                             "interpret", "mxu_precision"))
def corr1d_dma_call(x, w, rows, cols, n_out, interpret, mxu_precision):
    B, N = x.shape
    if B % rows != 0 or B < rows:
        raise ValueError(f"B={B} must be a positive multiple of rows={rows}")
    ws = w.shape[0]
    bands = _valid_band_matrices(w)
    # tail band pair: the filter prepended with d zeros, where d is the
    # static in-slab offset of the overlapped tail window
    n_cblocks = -(-n_out // cols)
    n_full = max(0, min(n_cblocks, (N - (cols + _LANES)) // cols + 1))
    tw = n_out - n_full * cols
    if tw > 0:
        wo_up = -(-tw // _LANES) * _LANES     # may exceed cols by 128
        s_w = wo_up + _LANES
        if s_w > N or wo_up > n_out:
            raise ValueError("input too short for the overlapped tail")
        d = (n_out - wo_up) - (N - s_w)   # = ws' alignment shift
        assert 0 <= d < _LANES + 1, d
        tbands = _valid_band_matrices(
            jnp.concatenate([jnp.zeros((d,), dtype=w.dtype), w]))
    else:
        tbands = bands
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
            pl.BlockSpec((2 * _LANES, _LANES), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols + 3 * _LANES), x.dtype),
            pltpu.VMEM((2, rows, cols + _LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bands, tbands, x)


def run_correctness():
    # always interpret: the unaligned-tail geometries compile only there
    # (HBM tiled memrefs reject unaligned lane offsets on hardware); the
    # aligned hardware path is correctness-checked inside run_bench
    from savgol_tpu.ops.pallas_conv import correlate_valid_pallas_mxu
    interpret = True
    rng = np.random.default_rng(0)
    for B, N, ws, cols in ((16, 4096, 25, 2048), (8, 5000, 25, 2048),
                           (16, 4333, 13, 1024), (8, 2100, 25, 1024)):
        x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws), dtype=jnp.float32)
        n_out = N - ws + 1
        got = corr1d_dma_call(x, w, rows=8, cols=cols, n_out=n_out,
                              interpret=interpret,
                              mxu_precision=jax.lax.Precision.HIGHEST)
        want = correlate_valid_pallas_mxu(x, w)
        err = float(jnp.abs(got - want).max())
        print(f"B={B} N={N} ws={ws} cols={cols}: max|d| vs library "
              f"{err:.3e}")
        assert err <= 1e-5, "manual-DMA kernel diverges"


def _bench_chain(fn, x, iters=5, k=4):
    """Chained on-device k-difference timing (benchmarks/chainlib.py);
    output fed back as next input, re-padded to length N."""
    N = x.shape[-1]

    def fb(y, template):
        nxt = jnp.pad(y * jnp.asarray(1e-3, dtype=y.dtype),
                      ((0, 0), (0, N - y.shape[-1])))
        return nxt.astype(template.dtype)

    return bench_chain(fn, x, iters=iters, k=k, feedback=fb)


def run_bench(iters):
    from savgol_tpu.ops.pallas_conv import correlate_valid_pallas_mxu
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(25), dtype=jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    B = 128

    # HBM memrefs are (8,128)-tiled: DMA offsets must be 128-divisible,
    # so this probe measures the PIPELINE question on a fully aligned
    # geometry (N = 2^20 + 128, n_out forced to 2^20: every DMA offset
    # lands on a lane boundary, d = 0). The unaligned case needs the
    # two-kernel aliased design (see ROADMAP) and is measured via the
    # library path only.
    N = 1_048_576 + 128
    n_out = 1_048_576
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    got = corr1d_dma_call(x[:8], w, rows=8, cols=2048, n_out=n_out,
                          interpret=False, mxu_precision=hp)
    want = correlate_valid_pallas_mxu(x[:8], w)[:, :n_out]
    err = float(jnp.abs(got - want).max())
    print(f"aligned hw correctness: {err:.3e}")
    assert err <= 1e-5
    t_lib = _bench_chain(
        lambda v: correlate_valid_pallas_mxu(v, w), x, iters=iters)
    print(f"library (n_out={N - 25 + 1}):      "
          f"{B * (N - 24) / t_lib / 1e9:6.2f} Gs/s")
    cases = ((128, 2048, 128), (128, 4096, 128), (64, 2048, 128),
             (256, 2048, 256))
    for rows, cols, Bc in cases:
        xc = x[:Bc] if Bc <= B else jnp.concatenate([x, x])[:Bc]
        try:
            t_dma = _bench_chain(
                lambda v, rows=rows, cols=cols: corr1d_dma_call(
                    v, w, rows=rows, cols=cols, n_out=n_out,
                    interpret=False, mxu_precision=hp), xc, iters=iters)
        except Exception as e:
            print(f"  dma[{rows}x{cols}] FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")
            continue
        print(f"  dma[{rows}x{cols}] B={Bc} "
              f"{Bc * n_out / t_dma / 1e9:6.2f} Gs/s")

    # library on unaligned N for the record
    Nu = 1_048_576 + 173
    xu = jnp.asarray(rng.standard_normal((B, Nu)), dtype=jnp.float32)
    t_lib = _bench_chain(
        lambda v: correlate_valid_pallas_mxu(v, w), xu, iters=iters)
    print(f"library unaligned N={Nu}: {B * (Nu - 24) / t_lib / 1e9:6.2f} "
          "Gs/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()
    if args.bench:
        # interpret-mode emulation through the TPU tunnel is glacial;
        # the aligned hardware correctness gate runs inside run_bench,
        # and the full geometry matrix runs on CPU (no --bench)
        assert jax.default_backend() == "tpu"
        run_bench(args.iters)
    else:
        run_correctness()
