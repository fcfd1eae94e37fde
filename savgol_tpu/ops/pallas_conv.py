"""Pallas TPU kernels for the hot Savitzky-Golay convolution paths.

The reference's hot loop is a 4-accumulator ILP dot product
(/root/reference/src/savgolFilter.c:547-580) tuned for CPU FMA ports. The
TPU-native analog is lane-level vectorization on the VPU: each kernel
invocation holds a (block_rows, block_cols) output tile in VMEM and
accumulates the 2n+1 taps as unrolled full-tile FMAs

    acc += w[k] * x[:, k : k + block_cols]          (k static, VPU)

which is exact f32 arithmetic — unlike XLA's conv lowering, which routes
through the MXU and needs Precision.HIGHEST (~6 bf16 passes) to approximate
f32, costing both speed and exactness.

Overlap handling ("halo") without manual DMA: the input is passed to the
kernel TWICE with different BlockSpecs — the main (rows, COLS) tile plus a
narrow (rows, 128) tile starting at the NEXT column block — so each grid
step sees [main | halo] = COLS + 128 columns, enough for any window up to
129 taps (2n <= 64 always; savgolFilter.h:39). The extra HBM traffic is
128/COLS ~= 12% instead of 2x. Same trick in 2D with four views
(main / right / bottom / corner).

All kernels compute VALID correlations on pre-padded, block-multiple inputs;
boundary semantics (reflect/wrap/edge pads, polynomial edge fixups) are
applied by the wrappers. Off-TPU the kernels run in interpreter mode so the
whole suite is testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "correlate_valid_pallas",
    "correlate_valid_pallas_mxu",
    "correlate_valid_bank_pallas",
    "correlate_valid_bank_pallas_mxu",
    "correlate2d_valid_pallas",
    "correlate2d_valid_pallas_rowmxu",
    "savgol_polynomial_pallas",
    "savgol_polynomial_pallas_mxu",
]

# f32 tiling: sublane x lane = 8 x 128.
_LANES = 128
_SUBLANES = 8
# Default output tile (measured on v5e: 32x2048 gives 14.1 Gsamples/s on
# the fused 1D kernel vs 10.8 at 8x1024). COLS must exceed the max window
# (65) plus edge width; ROWS trades VMEM for grid overhead.
_ROWS = 32
_COLS = 2048


def _interpret_default() -> bool:
    """Run in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _row_quantum(dtype) -> int:
    """Minimum sublane multiple for a VMEM tile of ``dtype`` (f32 packs
    8 sublanes per tile row-group, bf16/f16 pack 16)."""
    return 16 if dtype in (jnp.bfloat16, jnp.float16) else _SUBLANES


def _promote_half_for_exact(x, mxu_precision):
    """Half-precision operands cannot run HIGHEST matmuls (Mosaic rejects
    bf16x6 on bf16 inputs) and would silently degrade accuracy anyway;
    on the exact path, compute in f32 and restore the dtype on output.
    Returns (x_compute, restore_dtype_or_None)."""
    if (mxu_precision == jax.lax.Precision.HIGHEST
            and x.dtype in (jnp.bfloat16, jnp.float16)):
        return x.astype(jnp.float32), x.dtype
    return x, None


def _check_tile(rows: int, cols: int, row_quantum: int = _SUBLANES):
    """Validate caller-supplied tile shapes up front — misaligned tiles
    otherwise surface as opaque Mosaic lowering errors."""
    if rows <= 0 or rows % row_quantum:
        raise ValueError(
            f"rows must be a positive multiple of {row_quantum}, got {rows}")
    if cols <= 0 or cols % _LANES:
        raise ValueError(
            f"cols must be a positive multiple of {_LANES}, got {cols}")


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


# Thin inputs (few batch rows) waste the 8-sublane tile height (a single
# sequence uses 1/8 of the VPU and gives the MXU an M of 1). Folding the
# sample axis into rows fixes that: reshape each sequence into (R, S)
# chunks and append a 128-column halo copied from the next chunk's head —
# two reshaped slices and a concat, one extra data pass. Valid outputs per
# folded row: S; garbage past the true end is sliced off by the caller.
_FOLD_S = 2048
_FOLD_MAX_B = 16
_FOLD_MIN_OUT = 4 * _FOLD_S


def _fold_rows(xb: jax.Array, n_out: int, s: int = _FOLD_S):
    """(B, N) -> (B * R, S + 128) with inter-chunk halo; R = ceil(n_out/S).

    Row b*R + r covers outputs [r*S, (r+1)*S) of sequence b (tail garbage
    in the last chunk — slice to n_out after the kernel)."""
    B, N = xb.shape
    R = -(-n_out // s)
    total = R * s
    xpad = jnp.pad(xb, ((0, 0), (0, total + s - N)))
    a = xpad[:, :total].reshape(B, R, s)
    b = xpad[:, s:s + total].reshape(B, R, s)[:, :, :_LANES]
    return jnp.concatenate([a, b], axis=2).reshape(B * R, s + _LANES), R


# ---------------------------------------------------------------------------
# 1D valid correlation
# ---------------------------------------------------------------------------


_TAP_GROUP = 16   # taps accumulated in registers between o_ref writes:
                  # Mosaic keeps every product of a value chain live in
                  # scoped VMEM, so a 65-tap chain at a 32x2048 tile is
                  # ~16.6 MB — right at the cap (verified failing on
                  # hardware); grouping bounds liveness at ~16 tiles.


def _corr1d_kernel(w_ref, x_ref, halo_ref, o_ref, *, ws: int):
    """out[:, j] = sum_k w[k] * xw[:, j + k], xw = [main | halo]."""
    xw = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    cols = o_ref.shape[1]
    for g in range(0, ws, _TAP_GROUP):
        acc = w_ref[0, g] * xw[:, g:g + cols]
        for k in range(g + 1, min(g + _TAP_GROUP, ws)):
            acc += w_ref[0, k] * xw[:, k:k + cols]
        if g == 0:
            o_ref[:, :] = acc
        else:
            o_ref[:, :] = o_ref[:, :] + acc


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def _corr1d_call(xpad, w, rows, cols, interpret):
    B, Npad = xpad.shape
    n_out = Npad - _LANES          # final LANES columns are halo-only
    ws = w.shape[-1]
    grid = (B // rows, n_out // cols)
    kernel = functools.partial(_corr1d_kernel, ws=ws)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            # halo: first 128 columns of the NEXT column block
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, (ci + 1) * (cols // _LANES)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out), xpad.dtype),
        interpret=interpret,
    )(w.reshape(1, ws), xpad, xpad)


def correlate_valid_pallas(x: jax.Array, w: jax.Array,
                           rows: int = _ROWS, cols: int = _COLS,
                           interpret: bool | None = None) -> jax.Array:
    """Valid cross-correlation along the last axis (Pallas fast path).

    ``x``: (..., N); ``w``: (ws,); output (..., N - ws + 1). Exact f32.
    """
    if interpret is None:
        interpret = _interpret_default()
    if x.dtype in (jnp.bfloat16, jnp.float16):
        # the VPU tap loop would accumulate in the half dtype (~1e-2);
        # halves gain nothing on the VPU — compute f32, restore on output
        return correlate_valid_pallas(
            x.astype(jnp.float32), w, rows=rows, cols=cols,
            interpret=interpret).astype(x.dtype)
    _check_tile(rows, cols)
    ws = w.shape[0]
    if ws > _LANES + 1:
        raise ValueError(f"window size {ws} exceeds kernel halo limit")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    n_out = N - ws + 1
    xb = x.reshape((-1, N))
    B = xb.shape[0]
    w = w.astype(x.dtype)

    if B <= _FOLD_MAX_B and n_out >= _FOLD_MIN_OUT:
        xh, R = _fold_rows(xb, n_out)
        BR = xh.shape[0]
        rows_f = min(rows, _round_up(BR, _SUBLANES))
        xh = jnp.pad(xh, ((0, _round_up(BR, rows_f) - BR), (0, 0)))
        out = _corr1d_call(xh, w, rows_f, _FOLD_S, interpret)
        out = out[:BR].reshape(B, R * _FOLD_S)[:, :n_out]
        return out.reshape(batch_shape + (n_out,))

    rows = min(rows, _round_up(B, _SUBLANES))
    cols = min(cols, _round_up(max(n_out, _LANES), _LANES))
    Bp = _round_up(B, rows)
    n_out_p = _round_up(n_out, cols)
    Np = n_out_p + _LANES   # guarantees the halo block of the last column
    xp = jnp.pad(xb, ((0, Bp - B), (0, Np - N)))
    out = _corr1d_call(xp, w, rows, cols, interpret)
    return out[:B, :n_out].reshape(batch_shape + (n_out,))


# ---------------------------------------------------------------------------
# Fused polynomial-boundary 1D apply
# ---------------------------------------------------------------------------


def _sg1d_poly_kernel(w_ref, ewl_ref, ewt_ref, x_ref, halo_ref, o_ref,
                      *, ws: int, n: int,
                      tail_start: int, tail_out: int, last_ci: int):
    """Full-length savgol with POLYNOMIAL edges fused into one kernel.

    The input is zero-padded by n on the left (host side), so the center
    taps for output j read xpad[j .. j+2n]. Grid column 0 overwrites its
    first n outputs with the leading-edge matmul; grid column ``last_ci``
    overwrites outputs [tail_out, tail_out+n) with the trailing-edge matmul
    (src/savgolFilter.c:769-784 semantics, statically indexed).

    Mosaic has no in-kernel reverse, so the host pre-bakes the reversals
    into the edge matrices: ``ewl = lead_sign * ew[:, ::-1]`` (data-reverse
    + sign folded into column order) and ``ewt = ew[::-1, :]`` (output
    order n-1..0 folded into row order)."""
    ci = pl.program_id(1)
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    xw = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    cols = o_ref.shape[1]

    for g in range(0, ws, _TAP_GROUP):
        acc = w_ref[0, g] * xw[:, g:g + cols]
        for k in range(g + 1, min(g + _TAP_GROUP, ws)):
            acc += w_ref[0, k] * xw[:, k:k + cols]
        if g == 0:
            o_ref[:, :] = acc
        else:
            o_ref[:, :] = o_ref[:, :] + acc

    # Leading edge: out[e] = sum_j ewl[e,j] * x_raw[j]; x_raw[i]==xpad[n+i].
    @pl.when(ci == 0)
    def _():
        first = xw[:, n:n + ws]
        lead = jax.lax.dot_general(
            first, ewl_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_t,
        )                                          # (rows, n)
        o_ref[:, 0:n] = lead.astype(o_ref.dtype)

    # Trailing edge: out[N-n+i] = sum_k ewt[i,k] * x_raw[N-ws+k].
    @pl.when(ci == last_ci)
    def _():
        last = xw[:, tail_start:tail_start + ws]
        trail = jax.lax.dot_general(
            last, ewt_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_t,
        )
        o_ref[:, tail_out:tail_out + n] = trail.astype(o_ref.dtype)


def _sg1d_poly_kernel_v2(w_ref, ewl_ref, ewt_ref, left_ref, x_ref,
                         right_ref, o_ref, *, ws: int, n: int):
    """Copy-free variant: reads the raw input with LEFT and RIGHT halo
    views instead of a host-side padded copy (saves a full HBM round trip
    of the input). Outer blocks mask their out-of-range halos to zero; the
    edge matmuls then overwrite the affected outputs exactly as in v1."""
    ci = pl.program_id(1)
    n_ci = pl.num_programs(1)
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    cols = o_ref.shape[1]
    left = jnp.where(ci == 0, 0.0, left_ref[:, :])
    right = jnp.where(ci == n_ci - 1, 0.0, right_ref[:, :])
    xw = jnp.concatenate([left, x_ref[:, :], right], axis=1)

    # out col j: taps x[ci*cols + j - n + k] = xw[:, _LANES + j - n + k];
    # taps accumulate in _TAP_GROUP register groups (scoped-VMEM liveness)
    for g in range(0, ws, _TAP_GROUP):
        acc = w_ref[0, g] * xw[:, _LANES - n + g:_LANES - n + g + cols]
        for k in range(g + 1, min(g + _TAP_GROUP, ws)):
            acc += w_ref[0, k] * xw[:, _LANES - n + k:_LANES - n + k + cols]
        if g == 0:
            o_ref[:, :] = acc
        else:
            o_ref[:, :] = o_ref[:, :] + acc

    @pl.when(ci == 0)
    def _():
        first = xw[:, _LANES:_LANES + ws]          # x[0:ws]
        lead = jax.lax.dot_general(
            first, ewl_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_t)
        o_ref[:, 0:n] = lead.astype(o_ref.dtype)

    @pl.when(ci == n_ci - 1)
    def _():
        last = xw[:, _LANES + cols - ws:_LANES + cols]   # x[N-ws:N]
        trail = jax.lax.dot_general(
            last, ewt_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_t)
        o_ref[:, cols - n:cols] = trail.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n",
                                             "interpret"))
def _sg1d_poly_call_v2(x, w, ewl, ewt, rows, cols, n, interpret):
    B, N = x.shape
    ws = 2 * n + 1
    cb = cols // _LANES           # 128-blocks per column block
    last128 = N // _LANES - 1
    grid = (B // rows, N // cols)
    kernel = functools.partial(_sg1d_poly_kernel_v2, ws=ws, n=n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            # left halo: the 128 columns preceding this block (clamped for
            # block 0, masked to zero in-kernel)
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, jnp.maximum(ci * cb - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            # right halo: the 128 columns after this block (clamped)
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, jnp.minimum((ci + 1) * cb,
                                                         last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(w.reshape(1, ws), ewl, ewt, x, x, x)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n", "n_real",
                                             "interpret"))
def _sg1d_poly_call(xpad, w, ewl, ewt, rows, cols, n, n_real, interpret):
    B, Npad = xpad.shape
    ws = 2 * n + 1
    n_out_p = Npad - _LANES
    n_cblocks = n_out_p // cols
    last_ci = n_cblocks - 1
    # Static tail geometry within the last block (wrapper guarantees the
    # region [n_real - n, n_real) lies inside block last_ci):
    tail_out = n_real - n - last_ci * cols           # out col of out[N-n]
    tail_start = (n_real - ws + n) - last_ci * cols  # xpad col of x_raw[N-ws]
    assert 0 <= tail_out and 0 <= tail_start, (tail_out, tail_start)
    grid = (B // rows, n_cblocks)
    kernel = functools.partial(
        _sg1d_poly_kernel, ws=ws, n=n,
        tail_start=tail_start, tail_out=tail_out, last_ci=last_ci)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, (ci + 1) * (cols // _LANES)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out_p), xpad.dtype),
        interpret=interpret,
    )(w.reshape(1, ws), ewl, ewt, xpad, xpad)


def _cols_ok(N: int, n: int, cols: int) -> bool:
    """A block width is admissible for the fused-edge kernel iff the first
    block holds the whole leading window (cols >= ws + n = 3n+1) and the
    trailing-edge read window x_raw[N-ws ..] starts inside the last block
    (N % cols == 0 or N % cols > n)."""
    if cols % _LANES or cols < 3 * n + 1:
        return False
    r = N % cols
    return r == 0 or r > n


def _pick_cols(N: int, n: int, max_cols: int = _COLS):
    """Largest admissible lane-multiple block width, or None."""
    for cols in range(min(max_cols, _round_up(N, _LANES)), 0, -_LANES):
        if _cols_ok(N, n, cols):
            return cols
    return None


def savgol_polynomial_pallas(x: jax.Array, center_w: jax.Array,
                             edge_w: jax.Array, n: int,
                             dt_inv=1.0, lead_sign: float = 1.0,
                             rows: int = _ROWS, cols: int | None = None,
                             interpret: bool | None = None) -> jax.Array:
    """Same-length POLYNOMIAL-boundary apply as one fused kernel.

    Semantics of savgol_apply_core(.., BoundaryMode.POLYNOMIAL); ``dt_inv``
    is folded into the weights (sub-ulp difference vs multiply-after).
    Falls back to the split path (valid kernel + XLA edge matmuls) when no
    block geometry keeps the edge regions inside single blocks.
    """
    if interpret is None:
        interpret = _interpret_default()
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return savgol_polynomial_pallas(
            x.astype(jnp.float32), center_w, edge_w, n, dt_inv,
            lead_sign=lead_sign, rows=rows, cols=cols,
            interpret=interpret).astype(x.dtype)
    _check_tile(rows, cols if cols is not None else _COLS)
    ws = 2 * n + 1
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    if N < ws:
        raise ValueError(f"data length ({N}) must be >= window size ({ws})")
    xb = x.reshape((-1, N))
    B = xb.shape[0]

    dt = jnp.asarray(dt_inv, dtype=x.dtype)
    w = center_w.astype(x.dtype) * dt
    ew = edge_w.astype(x.dtype) * dt
    # Pre-bake the reversals (Mosaic has no in-kernel rev): lead uses
    # column-reversed weights (+ sign), trail uses row-reversed weights.
    ewl = ew[:, ::-1] * jnp.asarray(lead_sign, dtype=x.dtype)
    ewt = ew[::-1, :]

    rows = min(rows, _round_up(B, _SUBLANES))
    # Copy-free fast path: when shapes already align to tiles, skip the
    # padded copy entirely (v2 kernel with left+right halo views).
    if cols is None and B % rows == 0:
        for c2 in (2048, 4096, 1024, 512, 384, 256, 128):
            if c2 >= 3 * n + 1 and N % c2 == 0:
                out = _sg1d_poly_call_v2(xb, w, ewl, ewt, rows, c2,
                                         n, interpret)
                return out.reshape(batch_shape + (N,))

    pick = cols if cols is not None else _pick_cols(N, n)
    if pick is None or not _cols_ok(N, n, pick):
        # Fallback: center via the valid kernel, edges via XLA einsum.
        center = correlate_valid_pallas(xb, w, rows=rows,
                                        interpret=interpret)
        hp = jax.lax.Precision.HIGHEST
        lead = jnp.einsum("ek,bk->be", ew, xb[:, :ws][:, ::-1],
                          precision=hp) * lead_sign
        trail = jnp.einsum("ek,bk->be", ew, xb[:, -ws:],
                           precision=hp)[:, ::-1]
        out = jnp.concatenate([lead, center, trail], axis=-1)
        return out.reshape(batch_shape + (N,))

    cols = pick
    Bp = _round_up(B, rows)
    n_out_p = _round_up(N, cols)
    Np = n_out_p + _LANES
    # left zero-pad by n so center taps align; right-pad to block + halo
    xp = jnp.pad(xb, ((0, Bp - B), (n, Np - n - N)))
    out = _sg1d_poly_call(xp, w, ewl, ewt, rows, cols, n, N, interpret)
    return out[:B, :N].reshape(batch_shape + (N,))


# ---------------------------------------------------------------------------
# Fused polynomial-boundary 1D apply — banded-MXU variant
# ---------------------------------------------------------------------------
#
# The VPU tap loop costs several vector ops per tap (each shifted slice is a
# lane-rotate + select before the FMA), putting the n=12 kernel ~3x under
# the HBM roofline. The systolic array does the same correlation as dense
# matmuls against STATIONARY banded matrices. The production kernel uses
# the 2-band shifted-slab layout (see _sg1d_poly_mxu_kernel): shift the
# tile left by n lanes once on the VPU, then each output 128-block is one
# (rows, 256) @ (256, 128) matmul against the valid band pair [V0; V1] —
# 256 MACs/sample, the minimal aligned K covering a <=129-tap span. The
# naive alternative (retained below as _band_matrices for tests and the
# layout documentation) reads aligned blocks j-1, j, j+1 against three
# bands WL/WC/WR — 384 MACs/sample; the slab shift costs ~1/3 of that
# saving back on the VPU (measured v5e n=12 f32: 31.3 vs 24.0 Gs/s).
# The polynomial edges are fused exactly as in the VPU kernel.


@functools.lru_cache(maxsize=64)
def _poly_band_onehot(ws: int, n: int):
    """Constant one-hot for the 3-band stack: O[t, (j*128+q)*128+p] =
    [q - p + n + off_j == t], off_j in (-128, 0, 128)."""
    import numpy as np
    q = np.arange(_LANES)[:, None]
    p = np.arange(_LANES)[None, :]
    t = np.arange(ws)[:, None, None]
    blocks = [(q[None] - p[None] + n + off == t).astype(np.float32)
              for off in (-_LANES, 0, _LANES)]
    return np.concatenate(blocks, axis=1).reshape(ws, 3 * _LANES * _LANES)


def _band_matrices(w: jax.Array, n: int) -> jax.Array:
    """(3*128, 128) stationary band stack [WL; WC; WR].

    Entries are pure copies of w — no arithmetic — so exactness is
    preserved in any dtype. Concrete weights constant-fold the gather
    form; traced weights (the custom_vjp apply wrappers trace them) take
    the one-hot einsum instead — the on-device gather was measured as a
    dominant fixed cost (see _valid_band_matrices)."""
    w = jnp.asarray(w)
    ws = w.shape[0]
    if isinstance(w, jax.core.Tracer):
        oh = jnp.asarray(_poly_band_onehot(ws, n), dtype=w.dtype)
        flat = jnp.einsum("t,tk->k", w, oh,
                          precision=jax.lax.Precision.HIGHEST)
        return flat.reshape(3 * _LANES, _LANES)
    q = jnp.arange(_LANES)[:, None]
    p = jnp.arange(_LANES)[None, :]
    out = []
    for off in (-_LANES, 0, _LANES):
        k = q - p + n + off
        valid = (k >= 0) & (k < ws)
        out.append(jnp.where(valid, w[jnp.clip(k, 0, ws - 1)],
                             jnp.zeros((), dtype=w.dtype)))
    return jnp.concatenate(out, axis=0)


def _band_matrices_np(w, n: int):
    """Host-side twin of :func:`_band_matrices`, reshaped (3, 128, 128)
    (kept for tests/diagnostics on concrete f64 weights)."""
    import numpy as np
    q = np.arange(_LANES)[:, None]
    p = np.arange(_LANES)[None, :]
    ws = w.shape[0]
    out = []
    for off in (-_LANES, 0, _LANES):
        k = q - p + n + off
        valid = (k >= 0) & (k < ws)
        out.append(np.where(valid, np.asarray(w)[np.clip(k, 0, ws - 1)], 0.0))
    return np.stack(out)


def _sg1d_poly_mxu_kernel(bands_ref, ewl_ref, ewt_ref, left_ref, x_ref,
                          right_ref, o_ref, *, ws: int, n: int, cb: int,
                          mxu_precision, tail_rel: int, n_total: int):
    """Banded-MXU fused polynomial apply, 2-band shifted-slab form.

    The tile and its halo views are concatenated into ONE slab shifted
    left by n lanes, so output block j's 2n+1-tap span [j*128 - n,
    (j+1)*128 + n) occupies exactly two ALIGNED 128-lane blocks of the
    slab — each output block is a single (rows, 256) @ (256, 128) matmul
    against the stationary valid band pair [V0; V1] (V0[q, p] = w[q - p]).
    K = 256 is the minimal aligned cover of the span (any ws <= 129), i.e.
    1/3 less MXU work than the naive 3-band layout; the slab concat is one
    whole-tile lane relayout on the VPU, amortized over all cb blocks
    (measured v5e, n=12 f32 HIGHEST: 31.3 vs 24.0 Gs/s). Left/right
    128-col halo views are masked to zero at the global edges — those
    outputs are then overwritten by the fused edge matmuls."""
    ci = pl.program_id(1)
    n_ci = pl.num_programs(1)
    cols = cb * _LANES
    left = jnp.where(ci == 0, 0.0, left_ref[:, :])
    right = jnp.where(ci == n_ci - 1, 0.0, right_ref[:, :])
    xsh = jnp.concatenate([left[:, _LANES - n:], x_ref[:, :],
                           right[:, :_LANES - n]], axis=1)
    if n_total % cols:
        # the sequence length does not fill the last block: zero the
        # padding region (Pallas masked reads return arbitrary values —
        # NaN in interpreter mode — and NaN x zero-band = NaN). One
        # row-shaped validity condition broadcast over the slab select
        # (a multiply would pass NaN through).
        col = jax.lax.broadcasted_iota(jnp.int32, (1, xsh.shape[1]), 1)
        xsh = jnp.where(ci * cols + col - n < n_total, xsh, 0.0)

    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    # Mosaic rejects HIGHEST (bf16x6) matmuls on bf16 operands —
    # there is nothing to recover; single-pass is already operand-exact.
    edge_prec = (mxu_precision
                 if x_ref.dtype in (jnp.bfloat16, jnp.float16)
                 else jax.lax.Precision.HIGHEST)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for i in range(cb):
        xs = xsh[:, i * _LANES:i * _LANES + 2 * _LANES]
        o_ref[:, i * _LANES:(i + 1) * _LANES] = (
            mm(xs, bands_ref[:, :]).astype(o_ref.dtype))

    @pl.when(ci == 0)
    def _():
        first = x_ref[:, 0:ws]
        lead = jax.lax.dot_general(
            first, ewl_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=edge_prec,
            preferred_element_type=acc_t)
        o_ref[:, 0:n] = lead.astype(o_ref.dtype)

    # Trailing edge. ``tail_rel`` is the block-relative column just past
    # the LAST REAL sample inside the final block (cols when N divides the
    # block width). The trailing window x[N-ws, N) maps to slab columns
    # [tail_rel - ws + n, tail_rel + n) — its left end can dip up to n
    # columns into the previous block, which the n-column left-halo
    # portion of the slab already covers, so arbitrary N % cols > n
    # geometries need no host-side re-padding.
    @pl.when(ci == n_ci - 1)
    def _():
        last = xsh[:, tail_rel - ws + n:tail_rel + n]
        trail = jax.lax.dot_general(
            last, ewt_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=edge_prec,
            preferred_element_type=acc_t)
        o_ref[:, tail_rel - n:tail_rel] = trail.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n",
                                             "interpret", "mxu_precision"))
def _sg1d_poly_mxu_call(x, bands, ewl, ewt, rows, cols, n,
                        interpret, mxu_precision):
    # N need not divide cols: Pallas masks the partial trailing block
    # (writes beyond N are dropped; reads beyond N give padding garbage
    # that only ever feeds outputs the trailing-edge fixup overwrites —
    # admissibility r > n guarantees it). No host-side pad copy.
    B, N = x.shape
    ws = 2 * n + 1
    cb = cols // _LANES
    last128 = -(-N // _LANES) - 1
    r = N % cols
    tail_rel = cols if r == 0 else r
    grid = (B // rows, -(-N // cols))
    kernel = functools.partial(_sg1d_poly_mxu_kernel, ws=ws, n=n, cb=cb,
                               mxu_precision=mxu_precision,
                               tail_rel=tail_rel, n_total=N)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _LANES, _LANES), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, jnp.maximum(ci * (cols // _LANES)
                                                         - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi,
                                         jnp.minimum((ci + 1)
                                                     * (cols // _LANES),
                                                     last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(bands, ewl, ewt, x, x, x)


def savgol_polynomial_pallas_mxu(x: jax.Array, center_w: jax.Array,
                                 edge_w: jax.Array, n: int,
                                 dt_inv=1.0, lead_sign: float = 1.0,
                                 rows: int = 128, cols: int = 2048,
                                 interpret: bool | None = None,
                                 mxu_precision=None) -> jax.Array:
    """Same-length POLYNOMIAL apply, banded-MXU fused kernel.

    Semantics of savgol_apply_core(.., BoundaryMode.POLYNOMIAL). Requires
    window size <= 129 (always true: savgolFilter.h:39 caps n at 32).
    Shapes are padded to tile multiples; edge regions must land in the
    first/last column block (cols >= ws).
    """
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    x, restore = _promote_half_for_exact(x, mxu_precision)
    if restore is not None:
        y = savgol_polynomial_pallas_mxu(
            x, center_w, edge_w, n, dt_inv, lead_sign=lead_sign,
            rows=rows, cols=cols, interpret=interpret,
            mxu_precision=mxu_precision)
        return y.astype(restore)
    ws = 2 * n + 1
    if ws > _LANES + 1:
        raise ValueError(f"window size {ws} exceeds the 2-band structure")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    if N < ws:
        raise ValueError(f"data length ({N}) must be >= window size ({ws})")
    xb = x.reshape((-1, N))
    B = xb.shape[0]

    dt = jnp.asarray(dt_inv, dtype=x.dtype)
    bands = _valid_band_matrices(center_w.astype(x.dtype)) * dt
    ew = edge_w.astype(x.dtype) * dt
    ewl = ew[:, ::-1] * jnp.asarray(lead_sign, dtype=x.dtype)
    ewt = ew[::-1, :]

    rows = min(rows, _round_up(B, _row_quantum(x.dtype)))
    # Rare fully-inadmissible N (every candidate width has
    # 0 < N % c2 <= n) falls back to the VPU kernel's padded path.
    pick = _pick_block_width(N, n, ws, cols)
    if pick is None:
        return savgol_polynomial_pallas(
            x, center_w, edge_w, n, dt_inv, lead_sign=lead_sign,
            interpret=interpret)
    Bp = _round_up(B, rows)
    if Bp != B:                           # batch padding is semantics-free
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    out = _sg1d_poly_mxu_call(xb, bands, ewl, ewt, rows, pick, n,
                              interpret, mxu_precision)
    return out[:B].reshape(batch_shape + (N,))


_BLOCK_WIDTHS = (4096, 2048, 1024, 512, 384, 256, 128)


def _pick_block_width(N: int, n: int, ws: int,
                      first: int = 2048) -> int | None:
    """Admissible MXU block width for a same-length kernel, or None.

    Admissible: the lead window fits one block (cols >= ws) and the
    trailing region [N-n, N) lands inside the last block (N % cols == 0
    or > n; the trailing WINDOW may dip into the slab's left halo). The
    caller-preferred ``first`` (the measured 1D sweet spot) is tried
    before anything else; after it, remaining widths largest-first. The
    first admissible width whose masked-compute waste (ceil-padding) is
    <= 5% of N wins — big blocks amortize grid overhead — else the
    least-waste admissible one. Shared by the poly/pad wrappers and the
    bf16 dispatch predicate in ops.apply (keep in sync via this helper,
    not by copying the rule)."""
    best = None
    for c2 in (first,) + tuple(w for w in _BLOCK_WIDTHS if w != first):
        if c2 >= ws and c2 % _LANES == 0:
            r = N % c2
            if r == 0 or r > n:
                waste = _round_up(N, c2) - N
                if waste * 20 <= N:
                    return c2
                if best is None or waste < best[0]:
                    best = (waste, c2)
    return best[1] if best is not None else None


def _sg1d_pad_mxu_kernel(bands_ref, ls_ref, rs_ref, left_ref, x_ref,
                         right_ref, o_ref, *, n: int, cb: int,
                         mxu_precision, tail_rel: int, n_total: int):
    """Same-length apply for REFLECT/PERIODIC/CONSTANT boundaries with the
    boundary pad FUSED into the kernel: the host passes two TINY strips
    (rows, n) holding the virtual samples xv[-n:0) and xv[N:N+n) (reverse
    / wrap / clamp computed by XLA at O(B*n) cost), and the kernel splices
    them into the shifted slab's masked zero regions — the (B, N) input is
    never copied into a padded buffer. Same 2-band K=256 matmul structure
    as the fused polynomial kernel."""
    ci = pl.program_id(1)
    n_ci = pl.num_programs(1)
    cols = cb * _LANES
    W = cols + _LANES
    left = jnp.where(ci == 0, 0.0, left_ref[:, :])
    right = jnp.where(ci == n_ci - 1, 0.0, right_ref[:, :])
    xsh = jnp.concatenate([left[:, _LANES - n:], x_ref[:, :],
                           right[:, :_LANES - n]], axis=1)
    # zero everything at/beyond the true length (incl. where the right
    # strip will land; masked reads are arbitrary — NaN in interpret)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    xsh = jnp.where(ci * cols + col - n < n_total, xsh, 0.0)
    # splice the strips into the zeroed slots (addition is exact there)
    ls_full = jnp.pad(ls_ref[:, :], ((0, 0), (0, W - n)))
    xsh = xsh + jnp.where(ci == 0, ls_full, 0.0)
    rs_full = jnp.pad(rs_ref[:, :],
                      ((0, 0), (tail_rel + n, W - tail_rel - 2 * n)))
    xsh = xsh + jnp.where(ci == n_ci - 1, rs_full, 0.0)

    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for i in range(cb):
        xs = xsh[:, i * _LANES:i * _LANES + 2 * _LANES]
        o_ref[:, i * _LANES:(i + 1) * _LANES] = (
            mm(xs, bands_ref[:, :]).astype(o_ref.dtype))


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n",
                                             "interpret", "mxu_precision"))
def _sg1d_pad_mxu_call(x, bands, lstrip, rstrip, rows, cols, n,
                       interpret, mxu_precision):
    B, N = x.shape
    cb = cols // _LANES
    last128 = -(-N // _LANES) - 1
    r = N % cols
    tail_rel = cols if r == 0 else r
    grid = (B // rows, -(-N // cols))
    kernel = functools.partial(_sg1d_pad_mxu_kernel, n=n, cb=cb,
                               mxu_precision=mxu_precision,
                               tail_rel=tail_rel, n_total=N)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _LANES, _LANES), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda bi, ci: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda bi, ci: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, jnp.maximum(
                             ci * (cols // _LANES) - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, jnp.minimum(
                             (ci + 1) * (cols // _LANES), last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(bands, lstrip, rstrip, x, x, x)


def _boundary_strips(xb, n: int, pad_mode: str):
    """Virtual samples xv[-n:0) and xv[N:N+n) for a jnp.pad mode
    (symmetric / wrap / edge), as two (B, n) strips."""
    if pad_mode == "symmetric":
        return xb[:, :n][:, ::-1], xb[:, -n:][:, ::-1]
    if pad_mode == "wrap":
        return xb[:, -n:], xb[:, :n]
    if pad_mode == "edge":
        B = xb.shape[0]
        return (jnp.broadcast_to(xb[:, :1], (B, n)),
                jnp.broadcast_to(xb[:, -1:], (B, n)))
    raise ValueError(f"unsupported pad mode {pad_mode!r}")


def savgol_padded_pallas_mxu(x: jax.Array, center_w: jax.Array,
                             pad_mode: str, n: int, dt_inv=1.0,
                             rows: int = 128, cols: int = 2048,
                             interpret: bool | None = None,
                             mxu_precision=None) -> jax.Array:
    """Same-length REFLECT/PERIODIC/CONSTANT apply with the boundary pad
    fused into the banded-MXU kernel (no padded copy of the input).

    ``pad_mode``: "symmetric" / "wrap" / "edge" (the BoundaryMode mapping
    of savgol_tpu.ops.apply). Requires n >= 1 and an admissible block
    geometry (N % cols == 0 or > n); falls back to jnp.pad + the valid
    kernels otherwise.
    """
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    x, restore = _promote_half_for_exact(x, mxu_precision)
    if restore is not None:
        return savgol_padded_pallas_mxu(
            x, center_w, pad_mode, n, dt_inv, rows=rows, cols=cols,
            interpret=interpret,
            mxu_precision=mxu_precision).astype(restore)
    ws = 2 * n + 1
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    if N < ws:
        raise ValueError(f"data length ({N}) must be >= window size ({ws})")
    xb = x.reshape((-1, N))
    B = xb.shape[0]

    pick = _pick_block_width(N, n, ws, cols)
    if pick is None or n < 1:
        pad = ((0, 0), (n, n))
        xp = jnp.pad(xb, pad, mode=pad_mode)
        out = correlate_valid_pallas_mxu(xp, center_w,
                                         interpret=interpret,
                                         mxu_precision=mxu_precision)
        dt = jnp.asarray(dt_inv, dtype=x.dtype)
        return (out * dt).reshape(batch_shape + (N,))

    dt = jnp.asarray(dt_inv, dtype=x.dtype)
    bands = _valid_band_matrices(center_w.astype(x.dtype)) * dt
    ls, rs = _boundary_strips(xb, n, pad_mode)
    ls = ls.astype(x.dtype) if ls.dtype != x.dtype else ls
    rs = rs.astype(x.dtype) if rs.dtype != x.dtype else rs

    rows = min(rows, _round_up(B, _row_quantum(x.dtype)))
    Bp = _round_up(B, rows)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
        ls = jnp.pad(ls, ((0, Bp - B), (0, 0)))
        rs = jnp.pad(rs, ((0, Bp - B), (0, 0)))
    out = _sg1d_pad_mxu_call(xb, bands, ls, rs, rows, pick, n,
                             interpret, mxu_precision)
    return out[:B].reshape(batch_shape + (N,))


# Crossover between the VPU tap-loop kernels and the banded-MXU kernels:
# the matmul M dimension is the flattened batch, so the MXU path needs
# enough rows to stream. Measured chained on v5e (n=12, 262k samples):
# B=24 MXU 10.3 vs VPU 8.4 Gs/s, B=48 18.7 vs 9.3, B=128 30.5 vs ~18 —
# MXU wins from B=24; thinner batches (B<=16) fold into tile rows anyway.
_MXU_MIN_BATCH = 24

# The K-filter bank has its own crossover: each config adds a full band
# matmul, so the MXU bank kernel needs a wider batch to amortize than the
# single-filter kernels (measured separately on v5e at K=3: MXU wins from
# B=64, below that the VPU bank leads). Distinct from _MXU_MIN_BATCH by
# measurement, not by accident — models/bank.py dispatches on this.
_BANK_MXU_MIN_BATCH = 64


def savgol_polynomial_pallas_auto(x, center_w, edge_w, n, dt_inv=1.0,
                                  lead_sign: float = 1.0,
                                  interpret: bool | None = None):
    """Hardware pick between the VPU and banded-MXU fused kernels.

    Thin batches with long sequences take a split path: the center region
    through the FOLDED banded-MXU valid correlation (sample axis folded
    into matmul rows, so a single sequence still drives the full MXU) and
    the 2n edge outputs via XLA einsums."""
    if interpret is None:
        interpret = _interpret_default()
    B = 1
    for s in x.shape[:-1]:
        B *= s
    ws = 2 * n + 1
    N = x.shape[-1]
    if (not interpret and B <= _FOLD_MAX_B
            and N - 2 * n >= _FOLD_MIN_OUT):
        xb = x.reshape((-1, N))
        dt = jnp.asarray(dt_inv, dtype=x.dtype)
        w = center_w.astype(x.dtype) * dt
        ew = edge_w.astype(x.dtype) * dt
        center = correlate_valid_pallas_mxu(xb, w, interpret=interpret)
        hp = jax.lax.Precision.HIGHEST
        lead = jnp.einsum("ek,bk->be", ew, xb[:, :ws][:, ::-1],
                          precision=hp) * lead_sign
        trail = jnp.einsum("ek,bk->be", ew, xb[:, -ws:],
                           precision=hp)[:, ::-1]
        out = jnp.concatenate([lead, center, trail], axis=-1)
        return out.reshape(x.shape)
    if not interpret and B >= _MXU_MIN_BATCH:
        return savgol_polynomial_pallas_mxu(
            x, center_w, edge_w, n, dt_inv, lead_sign=lead_sign,
            interpret=interpret)
    return savgol_polynomial_pallas(
        x, center_w, edge_w, n, dt_inv, lead_sign=lead_sign,
        interpret=interpret)


def correlate_valid_pallas_auto(x, w, interpret: bool | None = None):
    """Hardware pick between the VPU and banded-MXU valid correlations."""
    if interpret is None:
        interpret = _interpret_default()
    B = 1
    for s in x.shape[:-1]:
        B *= s
    if not interpret and B >= _MXU_MIN_BATCH:
        return correlate_valid_pallas_mxu(x, w, interpret=interpret)
    return correlate_valid_pallas(x, w, interpret=interpret)


# ---------------------------------------------------------------------------
# Valid correlation — banded-MXU variant
# ---------------------------------------------------------------------------
#
# out[j] = sum_k w[k] x[j+k] aligns the band to q - p >= 0, so only TWO
# stationary matrices are needed (current block + right neighbor):
#     V0[q, p] = w[q - p]          (0 <= q - p < ws)
#     V1[q, p] = w[q + 128 - p]    (bottom-left corner)


@functools.lru_cache(maxsize=16)
def _valid_band_onehot(ws: int):
    """Constant one-hot tensor O[t, q*128+p] = [q - p == t] for the
    traced-weight band construction: V = w @ O reshaped (2*128, 128).
    Built on the host once per window size."""
    import numpy as np
    q = np.arange(2 * _LANES)[:, None]
    p = np.arange(_LANES)[None, :]
    t = np.arange(ws)[:, None, None]
    oh = (q[None] - p[None] == t).astype(np.float32)
    return oh.reshape(ws, 2 * _LANES * _LANES)


def _valid_band_matrices(w: jax.Array) -> jax.Array:
    """(2*128, 128) band stack [V0; V1] (jnp — works on traced weights).

    Entries are pure copies of w, so exactness is preserved in any dtype.
    For CONCRETE weights the gather form constant-folds at compile time;
    for TRACED weights the gather would run on-device every call (the
    TPU scalar-core gather was the dominant fixed cost of the sweep path
    — benchmarks/probe_sweep.py), so traced weights take a one-hot
    einsum instead: ONE (1, ws) @ (ws, 32768) matmul against a host
    constant. The one-hot entries are exact 0/1, so the contraction at
    HIGHEST reproduces the copies bit-for-bit (each output sums exactly
    one w[t] against 1.0)."""
    w = jnp.asarray(w)
    ws = w.shape[0]
    if isinstance(w, jax.core.Tracer):
        oh = jnp.asarray(_valid_band_onehot(ws), dtype=w.dtype)
        flat = jnp.einsum("t,tk->k", w, oh,
                          precision=jax.lax.Precision.HIGHEST)
        return flat.reshape(2 * _LANES, _LANES)
    q = jnp.arange(_LANES)[:, None]
    p = jnp.arange(_LANES)[None, :]
    out = []
    for off in (0, _LANES):
        k = q - p + off
        valid = (k >= 0) & (k < ws)
        out.append(jnp.where(valid, w[jnp.clip(k, 0, ws - 1)],
                             jnp.zeros((), dtype=w.dtype)))
    return jnp.concatenate(out, axis=0)


def _corr1d_mxu_kernel(bands_ref, x_ref, halo_ref, o_ref, *, cb: int,
                       mxu_precision, n_total: int | None):
    ci = pl.program_id(1)
    cols = cb * _LANES
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    xw = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    if n_total is not None:
        # input length does not fill the block/lane grid: zero the
        # padding region (masked reads are arbitrary; NaN x 0-band = NaN)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, xw.shape[1]), 1)
        xw = jnp.where(ci * cols + col < n_total, xw, 0.0)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    V0 = bands_ref[0:_LANES]
    V1 = bands_ref[_LANES:2 * _LANES]
    for i in range(cb):
        xc = xw[:, i * _LANES:(i + 1) * _LANES]
        xr = xw[:, (i + 1) * _LANES:(i + 2) * _LANES]
        acc = mm(xc, V0) + mm(xr, V1)
        o_ref[:, i * _LANES:(i + 1) * _LANES] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n_out",
                                             "interpret", "mxu_precision"))
def _corr1d_mxu_call(x, bands, rows, cols, interpret, mxu_precision,
                     n_out=None):
    # Two geometries: the legacy pre-padded form (n_out=None: trailing
    # _LANES columns are halo-only, everything block-aligned — used by the
    # fold path, which builds aligned rows anyway) and the no-pad masked
    # form (n_out given: x is the raw (B, N) input; partial trailing
    # blocks are masked in-kernel, no host pad copy).
    B, N = x.shape
    if n_out is None:
        no = N - _LANES
        n_total = None
    else:
        no = n_out
        aligned = (no % cols == 0) and (N % _LANES == 0)
        n_total = None if aligned else N
    cb = cols // _LANES
    last128 = -(-N // _LANES) - 1
    grid = (B // rows, -(-no // cols))
    kernel = functools.partial(_corr1d_mxu_kernel, cb=cb,
                               mxu_precision=mxu_precision,
                               n_total=n_total)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _LANES, _LANES), lambda bi, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi,
                                         jnp.minimum((ci + 1)
                                                     * (cols // _LANES),
                                                     last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, no), x.dtype),
        interpret=interpret,
    )(bands, x, x)


def correlate_valid_pallas_mxu(x: jax.Array, w: jax.Array,
                               rows: int = 128, cols: int = _COLS,
                               interpret: bool | None = None,
                               mxu_precision=None) -> jax.Array:
    """Valid cross-correlation along the last axis on the systolic array.

    Same contract as :func:`correlate_valid_pallas`; two stationary banded
    (128, 128) matmuls per output block instead of a ws-tap VPU loop —
    faster for wide batches (matmul M dimension = batch rows)."""
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    x, restore = _promote_half_for_exact(x, mxu_precision)
    if restore is not None:
        return correlate_valid_pallas_mxu(
            x, w, rows=rows, cols=cols, interpret=interpret,
            mxu_precision=mxu_precision).astype(restore)
    _check_tile(rows, cols)
    ws = w.shape[0]
    if ws > _LANES + 1:
        raise ValueError(f"window size {ws} exceeds kernel halo limit")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    n_out = N - ws + 1
    xb = x.reshape((-1, N))
    B = xb.shape[0]

    bands = _valid_band_matrices(w.astype(x.dtype))
    rq = _row_quantum(x.dtype)

    if B <= _FOLD_MAX_B and n_out >= _FOLD_MIN_OUT:
        xh, R = _fold_rows(xb, n_out)
        BR = xh.shape[0]
        rows_f = min(rows, _round_up(BR, rq))
        xh = jnp.pad(xh, ((0, _round_up(BR, rows_f) - BR), (0, 0)))
        out = _corr1d_mxu_call(xh, bands, rows_f, _FOLD_S, interpret,
                               mxu_precision)
        out = out[:BR].reshape(B, R * _FOLD_S)[:, :n_out]
        return out.reshape(batch_shape + (n_out,))

    rows = min(rows, _round_up(B, rq))
    cols = min(cols, _round_up(max(n_out, _LANES), _LANES))
    Bp = _round_up(B, rows)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    # no column pad: partial trailing blocks are masked in-kernel
    out = _corr1d_mxu_call(xb, bands, rows, cols, interpret, mxu_precision,
                           n_out=n_out)
    return out[:B].reshape(batch_shape + (n_out,))


# ---------------------------------------------------------------------------
# 2D valid correlation
# ---------------------------------------------------------------------------

# Measured on v5e (11x11 f32 stencil): 128x1024 is the consistent best
# (~1.7 Gpix/s median across repeated runs; larger/smaller tiles within 10%).
_ROWS2D = 128
_COLS2D = 1024
_HALO_R = 32   # >= 2 * MAX_HALF_WINDOW_2D (16), multiple of 8 sublanes


def _corr2d_kernel(w_ref, x_ref, right_ref, bot_ref, corner_ref, o_ref,
                   *, wh: int, ww: int, row_group: int):
    top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
    bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    r, c = o_ref.shape[1], o_ref.shape[2]

    # Accumulate ``row_group`` stencil rows into a value between o_ref
    # writes: Mosaic keeps every product of an expression tree live in
    # scoped VMEM (a fully unrolled chain costs ~wh*ww live tile
    # temporaries and blows the scoped limit — verified on hardware), so
    # the group size trades VMEM (~row_group*ww live tiles) against o_ref
    # round trips (wh / row_group instead of wh). The sublane (row) shift
    # is hoisted out of the tap loop — one shifted slab per stencil row,
    # then lane-only shifts per tap. (Mosaic cannot lower dynamic_slice on
    # values, so no fori_loop over rows.)
    acc = None
    for wy in range(wh):
        slab = xw[wy:wy + r, :]
        row = w_ref[wy, 0] * slab[:, 0:c]
        for wx in range(1, ww):
            row = row + w_ref[wy, wx] * slab[:, wx:wx + c]
        acc = row if acc is None else acc + row
        if (wy + 1) % row_group == 0 or wy == wh - 1:
            if wy + 1 <= row_group:
                o_ref[0] = acc
            else:
                o_ref[0] = o_ref[0] + acc
            acc = None


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret",
                                             "row_group", "vmem_limit"))
def _corr2d_call(xpad, w, rows, cols, interpret, row_group=1,
                 vmem_limit=None):
    B, Rp, Cp = xpad.shape
    out_r = Rp - _HALO_R
    out_c = Cp - _LANES
    wh, ww = w.shape
    grid = (B, out_r // rows, out_c // cols)
    kernel = functools.partial(_corr2d_kernel, wh=wh, ww=ww,
                               row_group=row_group)
    params = {}
    if vmem_limit is not None and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit))
    return pl.pallas_call(
        kernel,
        grid=grid,
        **params,
        in_specs=[
            pl.BlockSpec((wh, ww), lambda b, ri, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, cols),
                         lambda b, ri, ci: (b, ri, ci),
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
        interpret=interpret,
    )(w, xpad, xpad, xpad, xpad)


class _WKey:
    """Hashable wrapper keying kernel caches on concrete weight bytes."""

    __slots__ = ("array", "_k")

    def __init__(self, array):
        import numpy as np
        self.array = np.asarray(array, dtype=np.float64)
        self._k = (self.array.tobytes(), self.array.shape)

    def __hash__(self):
        return hash(self._k)

    def __eq__(self, other):
        return isinstance(other, _WKey) and other._k == self._k


def _concrete_np(a):
    """numpy f64 view of ``a`` if concrete, else None (traced)."""
    import numpy as np
    try:
        return np.asarray(a, dtype=np.float64)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError, TypeError):
        return None


@functools.lru_cache(maxsize=256)
def _corr2d_const_call(wkey: _WKey, rows: int, cols: int, interpret: bool):
    """Dense 2D kernel with the stencil baked as COMPILE-TIME immediates.

    Runtime SMEM scalar taps keep Mosaic from strength-reducing the
    stencil (measured 3.55 Gpix/s chained on v5e); constants let it emit
    the fast form (5.52 Gpix/s, exact f32). Cached per weight bytes — each
    distinct stencil costs one Mosaic compile, amortized by the
    persistent compilation cache."""
    w = wkey.array
    wh, ww = w.shape

    def kernel(x_ref, right_ref, bot_ref, corner_ref, o_ref):
        top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
        bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
        xw = jnp.concatenate([top, bottom], axis=0)
        r, c = o_ref.shape[1], o_ref.shape[2]
        for wy in range(wh):
            slab = xw[wy:wy + r, :]
            row = float(w[wy, 0]) * slab[:, 0:c]
            for wx in range(1, ww):
                row = row + float(w[wy, wx]) * slab[:, wx:wx + c]
            if wy == 0:
                o_ref[0] = row
            else:
                o_ref[0] = o_ref[0] + row

    @jax.jit
    def call(xpad):
        B, Rp, Cp = xpad.shape
        out_r = Rp - _HALO_R
        out_c = Cp - _LANES
        grid = (B, out_r // rows, out_c // cols)
        params = {}
        if not interpret:
            # Mosaic's scheduler can keep >16M of block values live for
            # SMALL stencils (measured: 5x5 at 128x1024 wants 24.8M
            # scoped); raise the cap — VMEM has room
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=grid,
            **params,
            in_specs=[
                pl.BlockSpec((1, rows, cols),
                             lambda b, ri, ci: (b, ri, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, _LANES),
                             lambda b, ri, ci: (b, ri,
                                                (ci + 1) * (cols // _LANES)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _HALO_R, cols),
                             lambda b, ri, ci: (b,
                                                (ri + 1) * (rows // _HALO_R),
                                                ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _HALO_R, _LANES),
                             lambda b, ri, ci: (b,
                                                (ri + 1) * (rows // _HALO_R),
                                                (ci + 1) * (cols // _LANES)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, cols),
                                   lambda b, ri, ci: (b, ri, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, out_r, out_c), xpad.dtype),
            interpret=interpret,
        )(xpad, xpad, xpad, xpad)

    return call


def correlate2d_valid_pallas(x: jax.Array, w: jax.Array,
                             rows: int = _ROWS2D, cols: int = _COLS2D,
                             interpret: bool | None = None,
                             row_group: int | None = None,
                             vmem_limit: int | None = None) -> jax.Array:
    """Valid 2D cross-correlation over the last two axes (single stencil).

    ``x``: (..., R, C); ``w``: (H, W) with H <= 33, W <= 33 (reference 2D
    limit is half_window 16 -> 33; savgol2d.h:63-73). Exact f32 on the VPU.

    ``row_group`` stencil rows accumulate in registers between output
    round trips (default picked to fit the scoped-VMEM budget);
    ``vmem_limit`` raises Mosaic's scoped-VMEM cap for larger groups.
    """
    if interpret is None:
        interpret = _interpret_default()
    _check_tile(rows, cols, row_quantum=_HALO_R)
    wh, ww = w.shape
    if wh > _HALO_R + 1 or ww > _LANES + 1:
        raise ValueError(f"stencil {w.shape} exceeds kernel halo limits")
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    out_r, out_c = R - wh + 1, C - ww + 1
    xb = x.reshape((-1, R, C))
    B = xb.shape[0]
    w = w.astype(x.dtype)

    if ww > 17 and cols == _COLS2D:
        # per-stencil-row liveness is ~ww tile temporaries; wide windows
        # need narrower tiles to stay inside the scoped-VMEM budget
        # (33x33 at 128x1024 f32 = ~17 MB > the 16 MB cap)
        cols = 512
    rows = min(rows, _round_up(max(out_r, _HALO_R), _HALO_R))
    cols = min(cols, _round_up(max(out_c, _LANES), _LANES))
    out_r_p = _round_up(out_r, rows)
    out_c_p = _round_up(out_c, cols)
    Rp = out_r_p + _HALO_R
    Cp = out_c_p + _LANES
    xp = jnp.pad(xb, ((0, 0), (0, Rp - R), (0, Cp - C)))
    w_np = _concrete_np(w)
    if w_np is not None and row_group is None and vmem_limit is None:
        if max(wh, ww) > 17:
            # wide stencils blow the dense kernel's scoped-VMEM liveness
            # even at narrow tiles; the rank-decomposed kernel both fits
            # and does ~3x fewer taps (r*(wh+ww) vs wh*ww)
            return correlate2d_valid_pallas_sep(x, w_np,
                                                interpret=interpret)
        # Concrete stencil: bake it into the kernel as immediates — Mosaic
        # emits a ~1.6x faster form than with runtime SMEM taps.
        out = _corr2d_const_call(_WKey(w_np), rows, cols, interpret)(xp)
        return out[:, :out_r, :out_c].reshape(batch_shape + (out_r, out_c))
    if row_group is None:
        # Measured on v5e: grouping does not beat the rmw baseline (2.26 vs
        # 2.28 Gpix/s at group 8 with a raised scoped-VMEM cap) — the o_ref
        # round trips hide behind the tap loop — so default to the proven
        # minimal-VMEM configuration; the knob stays for tuning.
        row_group = 1
    out = _corr2d_call(xp, w, rows, cols, interpret, row_group, vmem_limit)
    return out[:, :out_r, :out_c].reshape(batch_shape + (out_r, out_c))


def savgol2d_same_pallas(x: jax.Array, w, pad_mode: str,
                         rows: int = _ROWS2D, cols: int = _COLS2D,
                         interpret: bool | None = None) -> jax.Array:
    """Same-size 2D apply with the boundary pad FUSED into the tile pad.

    The split path (boundary jnp.pad, then the valid wrapper's tile-align
    pad) copies the image twice before the kernel; here ONE ``jnp.pad``
    provides both, extending with the boundary mode all the way to the
    tile-aligned size — the outputs beyond the true boundary ring are
    sliced away, so over-extension is harmless. ``w`` must be concrete
    (the stencil is baked into the kernel). ``pad_mode``: "edge" /
    "symmetric" / "wrap" (the CONSTANT / REFLECT / PERIODIC modes)."""
    import numpy as np
    if interpret is None:
        interpret = _interpret_default()
    _check_tile(rows, cols, row_quantum=_HALO_R)
    w = np.asarray(w)
    wh, ww = w.shape
    ny, nx = (wh - 1) // 2, (ww - 1) // 2
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    xb = x.reshape((-1, R, C))
    if max(wh, ww) > 17:
        # wide stencils: fall back to pad + separable (scoped-VMEM limits)
        pad = ((0, 0), (ny, ny), (nx, nx))
        xp = jnp.pad(xb, pad, mode=pad_mode)
        out = correlate2d_valid_pallas_sep(xp, w, interpret=interpret)
        return out.reshape(batch_shape + (R, C))

    rows = min(rows, _round_up(max(R, _HALO_R), _HALO_R))
    cols_eff = min(cols, _round_up(max(C, _LANES), _LANES))
    Rp = _round_up(R, rows) + _HALO_R
    Cp = _round_up(C, cols_eff) + _LANES
    # one pad supplies boundary ring + tile alignment + kernel halo;
    # jnp.pad's symmetric/edge modes require pad <= dim, which holds for
    # any image at least HALO_R + ny tall (tiny images take the split path)
    pr, pc = Rp - R - ny, Cp - C - nx
    if pr > R or pc > C:
        pad = ((0, 0), (ny, ny), (nx, nx))
        xp = jnp.pad(xb, pad, mode=pad_mode)
        out = correlate2d_valid_pallas(xp, jnp.asarray(w, dtype=x.dtype),
                                       interpret=interpret)
        return out.reshape(batch_shape + (R, C))
    xp = jnp.pad(xb, ((0, 0), (ny, pr), (nx, pc)), mode=pad_mode)
    out = _corr2d_const_call(_WKey(w), rows, cols_eff, interpret)(xp)
    return out[:, :R, :C].reshape(batch_shape + (R, C))


# ---------------------------------------------------------------------------
# 2D valid correlation — row-banded MXU variant (the 2D bf16 throughput path)
# ---------------------------------------------------------------------------
#
# Each stencil ROW is a 1D valid correlation along lanes, so per inner
# 128-column block the whole 2D stencil is wh matmuls of the slab window
# X2 = slab[:, i*128 : i*128+256] against that row's stationary valid band
# pair (B_k[q, p] = w[k, q - p]), followed by wh sublane-shifted adds:
#
#     out[r, p] = sum_k rowcorr_k[r + k, p],   rowcorr_k = X2 @ B_k
#
# wh * 256 MACs/pixel on the systolic array with NO per-tap lane shifts.
# At HIGHEST (6-pass) this ties the dense VPU kernel, so its purpose is
# the bf16 mode: single-pass DEFAULT matmuls on bf16 operands (f32
# accumulation) — ~28 Gpix/s theoretical vs the ~5 Gpix/s exact path, at
# the documented <=5e-3 relative contract.


def _rowband_matrices(w) -> jax.Array:
    """(wh, 2*128, 128) stack of per-stencil-row valid band pairs.

    Traced weights batch all rows through one one-hot einsum (see
    _valid_band_matrices for why gathers are avoided on device)."""
    w = jnp.asarray(w)
    if isinstance(w, jax.core.Tracer):
        oh = jnp.asarray(_valid_band_onehot(w.shape[1]), dtype=w.dtype)
        flat = jnp.einsum("kt,tm->km", w, oh,
                          precision=jax.lax.Precision.HIGHEST)
        return flat.reshape(w.shape[0], 2 * _LANES, _LANES)
    return jnp.stack([_valid_band_matrices(w[k]) for k in range(w.shape[0])])


def _corr2d_rowmxu_kernel(bands_ref, x_ref, right_ref, bot_ref, corner_ref,
                          o_ref, *, wh: int, cb: int, mxu_precision):
    # The vertical shift lives on the INPUT operand (Xk = xw[k:k+r]) —
    # measured on v5e bf16: 14.7 Gpix/s vs ~10 for the original
    # output-side form (rk = mm(X2)[k:k+r]): the input-side slice keeps
    # every f32 accumulator add aligned AND trims the matmul M from
    # rows+HALO_R to rows (benchmarks/probe_rowmxu.py; bit-identical).
    top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
    bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)   # (rows+HALO_R, cols+128)
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    r = o_ref.shape[1]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for i in range(cb):
        acc = None
        for k in range(wh):
            Xk = xw[k:k + r, i * _LANES:i * _LANES + 2 * _LANES]
            part = mm(Xk, bands_ref[k])           # (rows, 128) f32
            acc = part if acc is None else acc + part
        o_ref[0, :, i * _LANES:(i + 1) * _LANES] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret",
                                             "mxu_precision", "out_dtype"))
def _corr2d_rowmxu_call(xpad, bands, rows, cols, interpret, mxu_precision,
                        out_dtype=None):
    B, Rp, Cp = xpad.shape
    out_r = Rp - _HALO_R
    out_c = Cp - _LANES
    wh = bands.shape[0]
    grid = (B, out_r // rows, out_c // cols)
    kernel = functools.partial(_corr2d_rowmxu_kernel, wh=wh,
                               cb=cols // _LANES,
                               mxu_precision=mxu_precision)
    params = {}
    if not interpret:
        # Mosaic's scheduler keeps more block values live for SMALL wh
        # (measured: wh=5 at 256x512 tiles wants 24.8M scoped vs the 16M
        # default; wh=11 fits) — raise the scoped cap, VMEM has room
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        **params,
        in_specs=[
            pl.BlockSpec((wh, 2 * _LANES, _LANES),
                         lambda b, ri, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, cols),
                         lambda b, ri, ci: (b, ri, ci),
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
        out_shape=jax.ShapeDtypeStruct((B, out_r, out_c),
                                       out_dtype or xpad.dtype),
        interpret=interpret,
    )(bands, xpad, xpad, xpad, xpad)


def correlate2d_valid_pallas_rowmxu(x: jax.Array, w,
                                    rows: int = 256,
                                    cols: int = 512,
                                    interpret: bool | None = None,
                                    mxu_precision=None,
                                    out_dtype=None) -> jax.Array:
    # default tile 256x512: taller tiles feed the (rows+32, 256) matmuls
    # a bigger M (measured 11.3 vs 10.8 Gpix/s at 128x1024 on v5e bf16)
    """Valid 2D cross-correlation as per-stencil-row banded matmuls.

    Same contract as :func:`correlate2d_valid_pallas` (H <= 33, W <= 129).
    Pass bf16 ``x`` with ``mxu_precision=DEFAULT`` for the 2D throughput
    mode; f32 + HIGHEST is exact but no faster than the dense kernel.
    ``out_dtype`` lets the bf16 mode emit the f32 accumulator directly —
    the kernel writes 4 B/pix instead of 2, but a separate up-cast pass
    (read + write of the whole output) disappears.
    """
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    _check_tile(rows, cols, row_quantum=_HALO_R)
    w = jnp.asarray(w, dtype=x.dtype)
    wh, ww = w.shape
    if wh > _HALO_R + 1 or ww > _LANES + 1:
        raise ValueError(f"stencil {w.shape} exceeds kernel halo limits")
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    out_r, out_c = R - wh + 1, C - ww + 1
    xb = x.reshape((-1, R, C))

    bands = _rowband_matrices(w)
    rows = min(rows, _round_up(max(out_r, _HALO_R), _HALO_R))
    cols = min(cols, _round_up(max(out_c, _LANES), _LANES))
    Rp = _round_up(out_r, rows) + _HALO_R
    Cp = _round_up(out_c, cols) + _LANES
    xp = jnp.pad(xb, ((0, 0), (0, Rp - R), (0, Cp - C)))
    out = _corr2d_rowmxu_call(xp, bands, rows, cols, interpret,
                              mxu_precision, out_dtype)
    return out[:, :out_r, :out_c].reshape(batch_shape + (out_r, out_c))


def savgol2d_same_pallas_rowmxu(x: jax.Array, w, pad_mode: str,
                                rows: int = 256, cols: int = 512,
                                interpret: bool | None = None,
                                mxu_precision=None,
                                out_dtype=None) -> jax.Array:
    """Same-size row-banded MXU apply with the boundary pad FUSED into the
    tile pad (the bf16 throughput mode's same-size form).

    One ``jnp.pad`` supplies boundary ring + tile alignment + kernel halo
    (the split path copies the whole image twice before the kernel — see
    :func:`savgol2d_same_pallas` for the argument; the over-extended
    boundary values only feed outputs that are sliced away). Unlike the
    const-baked dense path, ``w`` may be traced (bands are built with
    jnp). ``pad_mode``: "edge" / "symmetric" / "wrap"."""
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    _check_tile(rows, cols, row_quantum=_HALO_R)
    w = jnp.asarray(w, dtype=x.dtype)
    wh, ww = w.shape
    if wh > _HALO_R + 1 or ww > _LANES + 1:
        raise ValueError(f"stencil {w.shape} exceeds kernel halo limits")
    ny, nx = (wh - 1) // 2, (ww - 1) // 2
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    xb = x.reshape((-1, R, C))

    rows = min(rows, _round_up(max(R, _HALO_R), _HALO_R))
    cols_eff = min(cols, _round_up(max(C, _LANES), _LANES))
    Rp = _round_up(R, rows) + _HALO_R
    Cp = _round_up(C, cols_eff) + _LANES
    pr, pc = Rp - R - ny, Cp - C - nx
    bands = _rowband_matrices(w)
    if pr > R or pc > C:
        # tiny images: jnp.pad's symmetric/edge require pad <= dim —
        # split path (boundary pad, then the valid wrapper's own pad)
        xp = jnp.pad(xb, ((0, 0), (ny, ny), (nx, nx)), mode=pad_mode)
        out = correlate2d_valid_pallas_rowmxu(
            xp, w, rows=rows, cols=cols, interpret=interpret,
            mxu_precision=mxu_precision, out_dtype=out_dtype)
        return out.reshape(batch_shape + (R, C))
    xp = jnp.pad(xb, ((0, 0), (ny, pr), (nx, pc)), mode=pad_mode)
    out = _corr2d_rowmxu_call(xp, bands, rows, cols_eff, interpret,
                              mxu_precision, out_dtype)
    return out[:, :R, :C].reshape(batch_shape + (R, C))


def _corr2d_rowmxu_stack_kernel(bands_ref, x_ref, right_ref, bot_ref,
                                corner_ref, o_ref, *, K: int, wh: int,
                                cb: int, mxu_precision):
    """K-stencil stack variant of the row-banded 2D kernel: the slab is
    read from HBM once and feeds all K stencils (the 2D twin of
    _bank_mxu_kernel — a K-pass loop would re-read the image K times)."""
    top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
    bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    r = o_ref.shape[2]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for i in range(cb):
        for k in range(K):
            acc = None
            for y in range(wh):
                # input-side vertical shift: aligned accumulates, smaller
                # matmul M (see _corr2d_rowmxu_kernel)
                Xy = xw[y:y + r, i * _LANES:i * _LANES + 2 * _LANES]
                part = mm(Xy, bands_ref[k, y])
                acc = part if acc is None else acc + part
            o_ref[k, 0, :, i * _LANES:(i + 1) * _LANES] = (
                acc.astype(o_ref.dtype))


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret",
                                             "mxu_precision", "out_dtype"))
def _corr2d_rowmxu_stack_call(xpad, bands, rows, cols, interpret,
                              mxu_precision, out_dtype=None):
    B, Rp, Cp = xpad.shape
    out_r = Rp - _HALO_R
    out_c = Cp - _LANES
    K, wh = bands.shape[0], bands.shape[1]
    grid = (B, out_r // rows, out_c // cols)
    kernel = functools.partial(_corr2d_rowmxu_stack_kernel, K=K, wh=wh,
                               cb=cols // _LANES,
                               mxu_precision=mxu_precision)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        **params,
        in_specs=[
            pl.BlockSpec((K, wh, 2 * _LANES, _LANES),
                         lambda b, ri, ci: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, cols),
                         lambda b, ri, ci: (b, ri, ci),
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
        out_specs=pl.BlockSpec((K, 1, rows, cols),
                               lambda b, ri, ci: (0, b, ri, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, out_r, out_c),
                                       out_dtype or xpad.dtype),
        interpret=interpret,
    )(bands, xpad, xpad, xpad, xpad)


def correlate2d_valid_pallas_rowmxu_stack(x: jax.Array, w_stack,
                                          rows: int = 256, cols: int = 512,
                                          interpret: bool | None = None,
                                          mxu_precision=None,
                                          out_dtype=None) -> jax.Array:
    """Valid 2D correlation of a (K, H, W) stencil stack, one input pass.

    Same per-stencil contract as :func:`correlate2d_valid_pallas_rowmxu`;
    output (K, ..., R-H+1, C-W+1)."""
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    _check_tile(rows, cols, row_quantum=_HALO_R)
    w_stack = jnp.asarray(w_stack, dtype=x.dtype)
    K, wh, ww = w_stack.shape
    if wh > _HALO_R + 1 or ww > _LANES + 1:
        raise ValueError(f"stencil {w_stack.shape} exceeds halo limits")
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    out_r, out_c = R - wh + 1, C - ww + 1
    xb = x.reshape((-1, R, C))

    bands = jnp.stack([_rowband_matrices(w_stack[k]) for k in range(K)])
    rows = min(rows, _round_up(max(out_r, _HALO_R), _HALO_R))
    cols = min(cols, _round_up(max(out_c, _LANES), _LANES))
    Rp = _round_up(out_r, rows) + _HALO_R
    Cp = _round_up(out_c, cols) + _LANES
    xp = jnp.pad(xb, ((0, 0), (0, Rp - R), (0, Cp - C)))
    out = _corr2d_rowmxu_stack_call(xp, bands, rows, cols, interpret,
                                    mxu_precision, out_dtype)
    return out[:, :, :out_r, :out_c].reshape(
        (K,) + batch_shape + (out_r, out_c))


# ---------------------------------------------------------------------------
# 2D valid correlation — separable (SVD rank-decomposed) variant
# ---------------------------------------------------------------------------
#
# A 2D Savitzky-Golay stencil w(x, y) is a bivariate polynomial of total
# degree <= order sampled on the grid, so its matrix rank is EXACTLY at
# most order+1: w = sum_k s_k u_k v_k^T (f64 SVD on the host, truncated at
# numerical rank). The correlation then factors into rank passes
#
#     out = sum_k colcorr(rowcorr(x, s_k * v_k), u_k)
#
# fused in ONE kernel per tile: the row pass costs ww lane-shift FMAs over
# the (rows + wh - 1)-tall slab, the column pass wh sublane-shift FMAs —
# r*(ww + wh) taps/pixel instead of wh*ww (11x11 order-3: 88 vs 121, and
# far fewer of the expensive shifted reads). o_ref accumulates between
# ranks to bound Mosaic's live-value set.


def _svd_stencil_np(w, rtol: float = 1e-9):
    """(H, W) stencil -> (u (r, H), v (r, W)) with w ~= sum_k outer(u_k, v_k)
    exactly to f64 rounding (r = numerical rank <= order+1)."""
    import numpy as np
    U, s, Vt = np.linalg.svd(np.asarray(w, dtype=np.float64))
    r = int(np.sum(s > rtol * s[0])) if s[0] > 0 else 1
    r = max(1, r)
    sq = np.sqrt(s[:r])
    return (U[:, :r] * sq).T, (Vt[:r, :] * sq[:, None])


@functools.lru_cache(maxsize=256)
def _corr2d_sep_const_call(ukey: _WKey, vkey: _WKey, rows: int, cols: int,
                           interpret: bool):
    """Separable 2D kernel with the rank factors baked as compile-time
    immediates (the SVD factors are always concrete — the decomposition
    happens on the host)."""
    u = ukey.array
    v = vkey.array
    rank, wh = u.shape
    ww = v.shape[1]

    def kernel(x_ref, right_ref, bot_ref, corner_ref, o_ref):
        top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
        bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
        xw = jnp.concatenate([top, bottom], axis=0)
        r, c = o_ref.shape[1], o_ref.shape[2]
        for k in range(rank):
            row = float(v[k, 0]) * xw[:, 0:c]     # (rows + HALO_R, c)
            for wx in range(1, ww):
                row = row + float(v[k, wx]) * xw[:, wx:wx + c]
            col = float(u[k, 0]) * row[0:r, :]
            for wy in range(1, wh):
                col = col + float(u[k, wy]) * row[wy:wy + r, :]
            if k == 0:
                o_ref[0] = col
            else:
                o_ref[0] = o_ref[0] + col

    @jax.jit
    def call(xpad):
        B, Rp, Cp = xpad.shape
        out_r = Rp - _HALO_R
        out_c = Cp - _LANES
        grid = (B, out_r // rows, out_c // cols)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows, cols),
                             lambda b, ri, ci: (b, ri, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, _LANES),
                             lambda b, ri, ci: (b, ri,
                                                (ci + 1) * (cols // _LANES)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _HALO_R, cols),
                             lambda b, ri, ci: (b,
                                                (ri + 1) * (rows // _HALO_R),
                                                ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _HALO_R, _LANES),
                             lambda b, ri, ci: (b,
                                                (ri + 1) * (rows // _HALO_R),
                                                (ci + 1) * (cols // _LANES)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, cols),
                                   lambda b, ri, ci: (b, ri, ci),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, out_r, out_c), xpad.dtype),
            interpret=interpret,
        )(xpad, xpad, xpad, xpad)

    return call


def _corr2d_sep_mxu_kernel(ub_ref, vb_ref, x_ref, right_ref, bot_ref,
                           corner_ref, o_ref, *, rank: int, cb: int,
                           mxu_precision):
    """Both separable passes as banded matmuls — NO shifted reads at all.

    Column pass: out_rows = U_k @ slab with the stationary band
    U_k[i, q] = u_k[q - i] (0 <= q - i < wh), a LEFT matmul contracting the
    sublane axis. Row pass: the 1D valid band pair [V0_k; V1_k] applied per
    128-column block (RIGHT matmuls). The VPU variant's per-tap lane/sublane
    relayouts — the actual cost driver, measured ~3 VPU ops per tap — are
    replaced by r*(wh + 2*128) MACs/pixel on the systolic array."""
    top = jnp.concatenate([x_ref[0], right_ref[0]], axis=1)
    bottom = jnp.concatenate([bot_ref[0], corner_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)   # (rows+HALO_R, cols+128)
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for k in range(rank):
        t = mm(ub_ref[k], xw)                     # (rows, cols+128)
        V0 = vb_ref[k, 0:_LANES]
        V1 = vb_ref[k, _LANES:2 * _LANES]
        for i in range(cb):
            tc = t[:, i * _LANES:(i + 1) * _LANES]
            tr = t[:, (i + 1) * _LANES:(i + 2) * _LANES]
            blk = (mm(tc, V0) + mm(tr, V1)).astype(o_ref.dtype)
            if k == 0:
                o_ref[0, :, i * _LANES:(i + 1) * _LANES] = blk
            else:
                o_ref[0, :, i * _LANES:(i + 1) * _LANES] = (
                    o_ref[0, :, i * _LANES:(i + 1) * _LANES] + blk)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret",
                                             "mxu_precision"))
def _corr2d_sep_mxu_call(xpad, ub, vb, rows, cols, interpret, mxu_precision):
    B, Rp, Cp = xpad.shape
    out_r = Rp - _HALO_R
    out_c = Cp - _LANES
    rank = ub.shape[0]
    grid = (B, out_r // rows, out_c // cols)
    kernel = functools.partial(_corr2d_sep_mxu_kernel, rank=rank,
                               cb=cols // _LANES,
                               mxu_precision=mxu_precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rank, rows, rows + _HALO_R),
                         lambda b, ri, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rank, 2 * _LANES, _LANES),
                         lambda b, ri, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, cols),
                         lambda b, ri, ci: (b, ri, ci),
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
        interpret=interpret,
    )(ub, vb, xpad, xpad, xpad, xpad)


def _sep_mxu_bands_np(u, v, rows: int):
    """Stationary bands for the double-banded kernel: U (r, rows, rows+32)
    with U[k, i, q] = u[k, q-i], and V (r, 2*128, 128) valid band pairs."""
    import numpy as np
    r, wh = u.shape
    ww = v.shape[1]
    q = np.arange(rows + _HALO_R)[None, :]
    i = np.arange(rows)[:, None]
    kidx = q - i
    valid = (kidx >= 0) & (kidx < wh)
    U = np.where(valid[None], u[:, np.clip(kidx, 0, wh - 1)], 0.0)
    qq = np.arange(_LANES)[:, None]
    pp = np.arange(_LANES)[None, :]
    Vs = []
    for off in (0, _LANES):
        kk = qq - pp + off
        vv = (kk >= 0) & (kk < ww)
        Vs.append(np.where(vv[None], v[:, np.clip(kk, 0, ww - 1)], 0.0))
    V = np.concatenate(Vs, axis=1)            # (r, 2*128, 128)
    return U, V


def correlate2d_valid_pallas_sep(x: jax.Array, w, rows: int = _ROWS2D,
                                 cols: int = _COLS2D,
                                 interpret: bool | None = None,
                                 engine: str = "auto",
                                 mxu_precision=None) -> jax.Array:
    """Valid 2D cross-correlation via the rank decomposition of ``w``.

    ``w`` must be a CONCRETE (host) array — the SVD happens at trace time.
    Exact for polynomial-least-squares stencils (their rank is structural,
    order+1 at most) up to f64 SVD rounding.

    ``engine``: "vpu" (shifted tap loops — what "auto" picks), or "mxu"
    (double-banded matmul formulation, selectable for probes/tuning).
    """
    import numpy as np
    if interpret is None:
        interpret = _interpret_default()
    _check_tile(rows, cols, row_quantum=_HALO_R)
    if engine == "auto":
        engine = "vpu"
    if engine not in ("vpu", "mxu"):
        raise ValueError(f"engine must be 'auto', 'vpu' or 'mxu', "
                         f"got {engine!r}")
    w = np.asarray(w)
    wh, ww = w.shape
    if wh > _HALO_R + 1 or ww > _LANES + 1:
        raise ValueError(f"stencil {w.shape} exceeds kernel halo limits")
    u, v = _svd_stencil_np(w)
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    out_r, out_c = R - wh + 1, C - ww + 1
    xb = x.reshape((-1, R, C))

    if max(wh, ww) > 17 and cols == _COLS2D:
        cols = 512              # scoped-VMEM liveness guard (see dense)
    rows = min(rows, _round_up(max(out_r, _HALO_R), _HALO_R))
    cols = min(cols, _round_up(max(out_c, _LANES), _LANES))
    Rp = _round_up(out_r, rows) + _HALO_R
    Cp = _round_up(out_c, cols) + _LANES
    xp = jnp.pad(xb, ((0, 0), (0, Rp - R), (0, Cp - C)))
    if engine == "mxu":
        if mxu_precision is None:
            mxu_precision = jax.lax.Precision.HIGHEST
        U, V = _sep_mxu_bands_np(u, v, rows)
        out = _corr2d_sep_mxu_call(
            xp, jnp.asarray(U, dtype=x.dtype), jnp.asarray(V, dtype=x.dtype),
            rows, cols, interpret, mxu_precision)
    else:
        out = _corr2d_sep_const_call(_WKey(u), _WKey(v), rows, cols,
                                     interpret)(xp)
    return out[:, :out_r, :out_c].reshape(batch_shape + (out_r, out_c))


# ---------------------------------------------------------------------------
# K-stencil bank kernel: one input read, K outputs
# ---------------------------------------------------------------------------

_BANK_VMEM_BUDGET = 10 * 1024 * 1024  # of ~16 MB/core scoped VMEM


def _bank_tile_cap(K: int, rows: int, cols: int, esize: int,
                   row_quantum: int) -> tuple[int, int]:
    """Shrink (rows, cols) until the bank kernels' VMEM footprint fits.

    The K-deep output block dominates: double-buffered it costs
    2*K*rows*cols*esize, plus the input slab 2*rows*(cols+128)*esize and
    (MXU variant) the K stationary band pairs 2*K*2*128*128*esize. At the
    wrapper defaults (K=15, rows=64, cols=2048, f32) that is ~21 MB —
    over the ~16 MB/core cap (observed RESOURCE_EXHAUSTED on v5e for the
    masked path's 15-pair Gram bank). Halve cols to its 128-lane floor,
    then rows to its quantum, keeping the total under _BANK_VMEM_BUDGET."""
    def fp(r, c):
        return 2 * esize * (K * r * c + r * (c + _LANES)
                            + K * 2 * _LANES * _LANES)
    while cols > _LANES and fp(rows, cols) > _BANK_VMEM_BUDGET:
        cols = max(_LANES, cols // 2 // _LANES * _LANES)
    while rows > row_quantum and fp(rows, cols) > _BANK_VMEM_BUDGET:
        rows = max(row_quantum, rows // 2 // row_quantum * row_quantum)
    return rows, cols


def _bank_kernel(w_ref, x_ref, halo_ref, o_ref, *, ws: int, K: int):
    """out[k, :, j] = sum_t w[k, t] * xw[:, j + t] for all K stencils.

    The input tile is read from HBM ONCE and reused across the K stencils —
    a K-filter bank costs one data pass instead of K. Taps accumulate in
    _TAP_GROUP-sized register groups (scoped-VMEM liveness bound)."""
    xw = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    cols = o_ref.shape[2]
    for k in range(K):
        for g in range(0, ws, _TAP_GROUP):
            acc = w_ref[k, g] * xw[:, g:g + cols]
            for t in range(g + 1, min(g + _TAP_GROUP, ws)):
                acc += w_ref[k, t] * xw[:, t:t + cols]
            if g == 0:
                o_ref[k] = acc
            else:
                o_ref[k] = o_ref[k] + acc


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def _bank_call(xpad, w, rows, cols, interpret):
    B, Npad = xpad.shape
    n_out = Npad - _LANES
    K, ws = w.shape
    grid = (B // rows, n_out // cols)
    kernel = functools.partial(_bank_kernel, ws=ws, K=K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, ws), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi, (ci + 1) * (cols // _LANES)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, rows, cols),
                               lambda bi, ci: (0, bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, n_out), xpad.dtype),
        interpret=interpret,
    )(w, xpad, xpad)


def _bank_mxu_kernel(bands_ref, x_ref, halo_ref, o_ref, *, cb: int, K: int,
                     mxu_precision, n_total: int | None):
    """K-stencil valid correlation on the MXU: per 128-block, K matmuls
    against per-stencil stationary band pairs share ONE slab read — the
    banded twin of _bank_kernel (K*ws VPU taps -> K*256 MACs on the
    systolic array; measured several-fold faster for wide banks)."""
    ci = pl.program_id(1)
    cols = cb * _LANES
    acc_t = (jnp.float64 if o_ref.dtype == jnp.float64 else jnp.float32)
    xw = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    if n_total is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, xw.shape[1]), 1)
        xw = jnp.where(ci * cols + col < n_total, xw, 0.0)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=mxu_precision, preferred_element_type=acc_t)

    for i in range(cb):
        xs = xw[:, i * _LANES:i * _LANES + 2 * _LANES]
        for c in range(K):
            o_ref[c, :, i * _LANES:(i + 1) * _LANES] = (
                mm(xs, bands_ref[c]).astype(o_ref.dtype))


@functools.partial(jax.jit, static_argnames=("rows", "cols", "n_out",
                                             "interpret", "mxu_precision"))
def _bank_mxu_call(x, bands, rows, cols, n_out, interpret, mxu_precision):
    B, N = x.shape
    K = bands.shape[0]
    cb = cols // _LANES
    last128 = -(-N // _LANES) - 1
    aligned = (n_out % cols == 0) and (N % _LANES == 0)
    kernel = functools.partial(_bank_mxu_kernel, cb=cb, K=K,
                               mxu_precision=mxu_precision,
                               n_total=None if aligned else N)
    return pl.pallas_call(
        kernel,
        grid=(B // rows, -(-n_out // cols)),
        in_specs=[
            pl.BlockSpec((K, 2 * _LANES, _LANES), lambda bi, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES),
                         lambda bi, ci: (bi,
                                         jnp.minimum((ci + 1)
                                                     * (cols // _LANES),
                                                     last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, rows, cols),
                               lambda bi, ci: (0, bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, n_out), x.dtype),
        interpret=interpret,
    )(bands, x, x)


def correlate_valid_bank_pallas_mxu(x: jax.Array, w: jax.Array,
                                    rows: int = 128, cols: int = _COLS,
                                    interpret: bool | None = None,
                                    mxu_precision=None) -> jax.Array:
    """Valid correlation with a (K, ws) stencil stack on the MXU.

    Same contract as :func:`correlate_valid_bank_pallas`; one input pass
    feeds K stationary band pairs. Works with traced weights (the sweep's
    on-device masked stencils)."""
    if interpret is None:
        interpret = _interpret_default()
    if mxu_precision is None:
        mxu_precision = jax.lax.Precision.HIGHEST
    x, restore = _promote_half_for_exact(x, mxu_precision)
    if restore is not None:
        return correlate_valid_bank_pallas_mxu(
            x, w, rows=rows, cols=cols, interpret=interpret,
            mxu_precision=mxu_precision).astype(restore)
    _check_tile(rows, cols)
    K, ws = w.shape
    if ws > _LANES + 1:
        raise ValueError(f"window size {ws} exceeds kernel halo limit")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    n_out = N - ws + 1
    xb = x.reshape((-1, N))
    B = xb.shape[0]
    w = w.astype(x.dtype)

    bands = jnp.stack([_valid_band_matrices(w[c]) for c in range(K)])
    rq = _row_quantum(x.dtype)

    if B <= _FOLD_MAX_B and n_out >= _FOLD_MIN_OUT:
        # thin batches: fold the sample axis into matmul rows so the MXU
        # M dimension is full even for a single sequence
        xh, R = _fold_rows(xb, n_out)
        BR = xh.shape[0]
        rows_f = min(rows, _round_up(BR, rq))
        rows_f, cols_f = _bank_tile_cap(K, rows_f, min(cols, _FOLD_S),
                                        x.dtype.itemsize, rq)
        xh = jnp.pad(xh, ((0, _round_up(BR, rows_f) - BR), (0, 0)))
        out = _bank_mxu_call(xh, bands, rows_f, cols_f, _FOLD_S,
                             interpret, mxu_precision)
        out = out[:, :BR].reshape(K, B, R * _FOLD_S)[:, :, :n_out]
        return out.reshape((K,) + batch_shape + (n_out,))

    rows = min(rows, _round_up(B, rq))
    cols = min(cols, _round_up(max(n_out, _LANES), _LANES))
    rows, cols = _bank_tile_cap(K, rows, cols, x.dtype.itemsize, rq)
    Bp = _round_up(B, rows)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    out = _bank_mxu_call(xb, bands, rows, cols, n_out, interpret,
                         mxu_precision)
    return out[:, :B].reshape((K,) + batch_shape + (n_out,))


def correlate_valid_bank_pallas(x: jax.Array, w: jax.Array,
                                rows: int = _ROWS, cols: int = _COLS,
                                interpret: bool | None = None) -> jax.Array:
    """Valid correlation with a STACK of stencils sharing one input pass.

    ``x``: (..., N); ``w``: (K, ws). Output (K, ..., N - ws + 1).
    """
    if interpret is None:
        interpret = _interpret_default()
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return correlate_valid_bank_pallas(
            x.astype(jnp.float32), w, rows=rows, cols=cols,
            interpret=interpret).astype(x.dtype)
    _check_tile(rows, cols)
    K, ws = w.shape
    if ws > _LANES + 1:
        raise ValueError(f"window size {ws} exceeds kernel halo limit")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    n_out = N - ws + 1
    xb = x.reshape((-1, N))
    B = xb.shape[0]
    w = w.astype(x.dtype)

    if B <= _FOLD_MAX_B and n_out >= _FOLD_MIN_OUT:
        xh, R = _fold_rows(xb, n_out)
        BR = xh.shape[0]
        rows_f = min(rows, _round_up(BR, _SUBLANES))
        rows_f, cols_f = _bank_tile_cap(K, rows_f, _FOLD_S,
                                        x.dtype.itemsize, _SUBLANES)
        xh = jnp.pad(xh, ((0, _round_up(BR, rows_f) - BR), (0, 0)))
        out = _bank_call(xh, w, rows_f, cols_f, interpret)
        out = out[:, :BR].reshape(K, B, R * _FOLD_S)[:, :, :n_out]
        return out.reshape((K,) + batch_shape + (n_out,))

    rows = min(rows, _round_up(B, _SUBLANES))
    cols = min(cols, _round_up(max(n_out, _LANES), _LANES))
    rows, cols = _bank_tile_cap(K, rows, cols, x.dtype.itemsize, _SUBLANES)
    Bp = _round_up(B, rows)
    n_out_p = _round_up(n_out, cols)
    Np = n_out_p + _LANES
    xp = jnp.pad(xb, ((0, Bp - B), (0, Np - N)))
    out = _bank_call(xp, w, rows, cols, interpret)
    return out[:, :B, :n_out].reshape((K,) + batch_shape + (n_out,))
