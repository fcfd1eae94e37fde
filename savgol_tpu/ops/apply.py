"""1D Savitzky-Golay application — XLA-native, jit/vmap/grad/shard-friendly.

Semantics match the reference exactly (region layout
/root/reference/src/savgolFilter.c:743-804):

  * center region (output j in [n, N-n)): correlation with the centered
    stencil;
  * POLYNOMIAL boundary: the n leading outputs come from the edge-weight
    matrix applied to the *reversed* first window, the n trailing outputs
    from the same rows applied forward to the last window
    (src/savgolFilter.c:769-784 — mirror symmetry lets one n x (2n+1)
    matrix serve both ends);
  * REFLECT / PERIODIC / CONSTANT boundaries: virtual samples
    (src/savgolFilter.c:442-482) — expressed here as one jnp.pad
    (symmetric / wrap / edge) followed by a full valid correlation, which is
    equivalent in exact arithmetic to the reference's per-tap indexing;
  * derivative outputs scaled by 1 / time_step**derivative
    (src/savgolFilter.c:759).

Intentional divergences from the C (documented per SURVEY.md §7):

  * **Leading-edge odd-derivative sign.** The reference convolves the
    leading edge against *reversed* data with the trailing-edge weight rows
    (src/savgolFilter.c:773-777). Reversal negates odd derivatives, so the C
    emits ``-p'(x)`` for the first n samples when ``derivative`` is odd
    (verified against the compiled reference: d=1 on y=3x gives -3 for
    out[0..n-1]). MATLAB sgolayfilt / scipy mode='interp' return +3. The
    default here is the mathematically correct sign (leading outputs are
    multiplied by ``(-1)**derivative``); pass ``reference_edge_sign=True``
    to reproduce the C bit-for-bit. Even derivatives are unaffected.
  * **In-place aliasing.** JAX arrays are immutable, so ``output is input``
    aliasing cannot read half-filtered values — the reference's in-place
    center pass does (src/savgolFilter.c:763-766).
  * **Strided access.** ``savgol_apply_strided`` (byte strides into struct
    arrays, src/savgolFilter.c:877-934) is a memory-layout feature with no
    JAX meaning; the idiomatic equivalent is the ``axis=`` argument —
    filtering any axis of an ND array with all other axes batched.

Precision: on TPU, XLA lowers f32 convolutions/matmuls to bf16 MXU passes by
default (~1e-3 relative error). Every contraction here defaults to
``lax.Precision.HIGHEST`` so f32 results hold the <=1e-6 parity target; pass
``precision=lax.Precision.DEFAULT`` to trade accuracy for MXU throughput.
The Pallas fast path (savgol_tpu.ops.pallas_conv) instead computes on the
VPU in true f32 and is both exact and fast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from savgol_tpu.config import PAD_MODE, BoundaryMode

__all__ = [
    "correlate_valid",
    "correlate_valid_mxu",
    "savgol_apply_core",
    "savgol_apply",
    "savgol_apply_valid",
]

_PAD_MODE = PAD_MODE   # canonical mapping lives next to BoundaryMode


def _mxu_min_batch_pad() -> int:
    """Batch width from which the fused boundary-pad MXU kernel beats the
    jnp.pad + VPU-kernel route — the SAME measured crossover as the poly
    kernels', read from its single home (lazy import: pallas_conv imports
    are deferred everywhere in this module)."""
    from savgol_tpu.ops import pallas_conv
    return pallas_conv._MXU_MIN_BATCH


def _resolve_method(method: str, ws: int) -> str:
    """'auto' -> fastest path for the hardware: the Pallas kernels on TPU
    (their own auto picker chooses the banded-MXU kernel, the VPU tap
    loop, or the folded form by batch width — the 2-band K=256 matmul
    structure covers every window up to 129 taps at the same rate, so
    there is no wide-window special case: measured n=32 B=128, Pallas
    MXU 25.7 vs the old XLA banded-einsum route 8.3 Gs/s); plain XLA
    elsewhere (Pallas would run interpreted off-TPU)."""
    del ws
    if method != "auto":
        return method
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _ensure_float(x: jax.Array, w: jax.Array) -> jax.Array:
    """Promote integer/bool inputs to the weights' floating dtype.

    Casting f32 weights *down* to an int input dtype would truncate them to
    zero and silently return garbage."""
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        return x.astype(w.dtype)
    return x


def _complex_split(fn, x):
    """Apply a real-linear filter to complex data: real and imaginary
    parts stacked as one extra batch row pair (one kernel pass), then
    recombined — scipy's savgol_filter accepts complex input, so the
    drop-in surface does too."""
    parts = jnp.stack([x.real, x.imag])         # (2, ..., N)
    y = fn(parts)
    return jax.lax.complex(y[0], y[1])


def _compute_dtype(x: jax.Array):
    """Half-precision inputs compute in f32 (quantizing the WEIGHTS to
    bf16/f16 would cost ~1e-2 accuracy); returns (x_f32, restore_dtype)."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32), x.dtype
    return x, None


def correlate_valid(x: jax.Array, w: jax.Array,
                    precision=lax.Precision.HIGHEST) -> jax.Array:
    """Valid cross-correlation along the last axis.

    ``out[..., j] = sum_k w[k] * x[..., j + k]`` — the center-region sum of
    the reference (src/savgolFilter.c:418). ``x`` has shape (..., N); the
    output has shape (..., N - len(w) + 1).
    """
    ws = w.shape[-1]
    batch_shape = x.shape[:-1]
    n_in = x.shape[-1]
    xb = x.reshape((-1, 1, n_in))
    out = lax.conv_general_dilated(
        xb,
        w.reshape((1, 1, ws)).astype(x.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    return out.reshape(batch_shape + (n_in - ws + 1,))


@functools.lru_cache(maxsize=None)
def _pallas_poly_diff(n: int, lead_sign: float, mode: str = "exact"):
    """Differentiable wrapper for the fused Pallas polynomial apply.

    Pallas kernels have no autodiff rules; the filter is (bi)linear in
    (x, weights), so the backward pass is the VJP of the XLA twin — exact
    up to f32 rounding, costing one XLA apply per cotangent.

    ``mode="bf16"``: the memory-bound throughput path — input, stationary
    bands, and output all in bfloat16 through the banded-MXU kernel at
    single-pass (DEFAULT) matmul precision, ~2x the exact-path HBM ceiling
    at a documented ~5e-3 relative accuracy contract. Gradients still flow
    through the exact f32 XLA twin. Falls back to the exact path when no
    block geometry divides the sequence (accuracy is then better, never
    worse, than the contract)."""

    def xla_poly(x, cw, ew, dt_inv):
        ws = 2 * n + 1
        N = x.shape[-1]
        center = correlate_valid(x, cw)
        ewc = ew.astype(x.dtype)
        lead = jnp.einsum("ek,...k->...e", ewc, x[..., :ws][..., ::-1],
                          precision=lax.Precision.HIGHEST) * lead_sign
        trail = jnp.einsum("ek,...k->...e", ewc, x[..., N - ws:],
                           precision=lax.Precision.HIGHEST)[..., ::-1]
        y = jnp.concatenate([lead, center, trail], axis=-1)
        return y * jnp.asarray(dt_inv, dtype=x.dtype)

    @jax.custom_vjp
    def op(x, cw, ew, dt_inv):
        from savgol_tpu.ops import pallas_conv
        if mode == "bf16":
            ws = 2 * n + 1
            N = x.shape[-1]
            # single source of truth for block admissibility
            ok = pallas_conv._pick_block_width(N, n, ws) is not None
            if ok:
                # cols=4096 preference: at DEFAULT-precision bf16 the
                # kernel is HBM-floor-bound and the wider tile measured
                # 83.9 vs 77.3 Gs/s chained (probe_bf16_1d.py, v5e);
                # _pick_block_width falls back when inadmissible
                y = pallas_conv.savgol_polynomial_pallas_mxu(
                    x.astype(jnp.bfloat16), cw, ew, n, dt_inv,
                    lead_sign=lead_sign, cols=4096,
                    mxu_precision=lax.Precision.DEFAULT)
                return y.astype(x.dtype)
        return pallas_conv.savgol_polynomial_pallas_auto(
            x, cw, ew, n, dt_inv, lead_sign=lead_sign)

    def fwd(x, cw, ew, dt_inv):
        return op(x, cw, ew, dt_inv), (x, cw, ew, dt_inv)

    def bwd(res, g):
        _, vjp = jax.vjp(xla_poly, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_pad_diff(n: int, pad_mode: str, mode: str = "exact"):
    """Differentiable wrapper for the fused boundary-pad banded-MXU apply
    (REFLECT/PERIODIC/CONSTANT without a padded input copy). Backward is
    the VJP of the jnp.pad + valid-correlation XLA twin."""

    def xla_twin(x, cw, dt_inv):
        pad = [(0, 0)] * (x.ndim - 1) + [(n, n)]
        xp = jnp.pad(x, pad, mode=pad_mode)
        return correlate_valid(xp, cw) * jnp.asarray(dt_inv, dtype=x.dtype)

    @jax.custom_vjp
    def op(x, cw, dt_inv):
        from savgol_tpu.ops import pallas_conv
        if mode == "bf16":
            y = pallas_conv.savgol_padded_pallas_mxu(
                x.astype(jnp.bfloat16), cw, pad_mode, n, dt_inv,
                mxu_precision=lax.Precision.DEFAULT)
            return y.astype(x.dtype)
        return pallas_conv.savgol_padded_pallas_mxu(
            x, cw, pad_mode, n, dt_inv)

    def fwd(x, cw, dt_inv):
        return op(x, cw, dt_inv), (x, cw, dt_inv)

    def bwd(res, g):
        _, vjp = jax.vjp(xla_twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_corr_diff(mode: str = "exact"):
    """Differentiable wrapper for the Pallas valid correlation.

    ``mode="bf16"``: banded-MXU correlation on bfloat16 data at DEFAULT
    matmul precision (throughput contract, ~5e-3 relative)."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        if mode == "bf16":
            y = pallas_conv.correlate_valid_pallas_mxu(
                x.astype(jnp.bfloat16), w,
                mxu_precision=lax.Precision.DEFAULT)
            return y.astype(x.dtype)
        return pallas_conv.correlate_valid_pallas_auto(x, w)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _move_axis_last(x, axis):
    axis = axis % x.ndim
    if axis == x.ndim - 1:
        return x, None
    return jnp.moveaxis(x, axis, -1), axis


def _restore_axis(y, axis):
    if axis is None:
        return y
    return jnp.moveaxis(y, -1, axis)


def savgol_apply_core(
    x: jax.Array,
    center_w: jax.Array,
    edge_w: Optional[jax.Array],
    half_window: int,
    boundary: BoundaryMode,
    dt_inv: float | jax.Array = 1.0,
    *,
    derivative: int = 0,
    reference_edge_sign: bool = False,
    use_pallas: bool = False,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Filter the last axis of ``x``; same-length output.

    ``center_w``: (2n+1,) stencil; ``edge_w``: (n, 2n+1) edge rows (required
    for POLYNOMIAL boundary, ignored otherwise). ``half_window`` and
    ``derivative`` must be Python ints (static). Fully differentiable and
    vmappable.

    ``method`` selects the compute path: "auto" (the default — fastest
    path for the hardware: Pallas/MXU on TPU, XLA elsewhere), "xla" (conv,
    HIGHEST precision), "pallas" (fused VPU kernel — fastest exact-f32),
    "mxu" (banded matmuls on the systolic array), or "bf16" (bfloat16
    banded-MXU throughput mode — ~2x the exact-path memory ceiling at a
    ~5e-3 relative accuracy contract). ``use_pallas=True`` is an alias for
    method="pallas".
    """
    if use_pallas:
        method = "pallas"
    if not isinstance(boundary, BoundaryMode):
        # same string coercion SavgolConfig applies ("periodic" etc.)
        boundary = BoundaryMode(boundary)
    n = int(half_window)
    ws = 2 * n + 1
    method = _resolve_method(method, ws)
    if method not in ("xla", "pallas", "mxu", "bf16"):
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'mxu' or 'bf16', "
            f"got {method!r}")
    N = x.shape[-1]
    if N < ws:
        raise ValueError(
            f"data length ({N}) must be >= window size ({ws})")
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return _complex_split(
            lambda v: savgol_apply_core(
                v, center_w, edge_w, half_window, boundary, dt_inv,
                derivative=derivative,
                reference_edge_sign=reference_edge_sign, method=method,
                precision=precision), x)
    x = _ensure_float(x, center_w)
    x, restore = _compute_dtype(x)
    lead_sign = 1.0
    if not reference_edge_sign and (int(derivative) % 2 == 1):
        lead_sign = -1.0

    if boundary is BoundaryMode.POLYNOMIAL:
        if method in ("pallas", "bf16"):
            op = _pallas_poly_diff(
                n, lead_sign, "bf16" if method == "bf16" else "exact")
            y = op(x, center_w, edge_w,
                   jnp.asarray(dt_inv, dtype=x.dtype))
            return y.astype(restore) if restore is not None else y
        corr = correlate_valid_mxu if method == "mxu" else correlate_valid
        center = corr(x, center_w, precision)              # (..., N - 2n)
        ew = edge_w.astype(x.dtype)
        # Leading: out[e] = sum_k ew[e, k] * x[ws-1-k]  (reversed window)
        first = x[..., :ws][..., ::-1]
        lead = jnp.einsum("ek,...k->...e", ew, first,
                          precision=precision) * lead_sign
        # Trailing: out[N-1-e] = sum_k ew[e, k] * x[N-ws+k]  (forward)
        last = x[..., N - ws:]
        trail = jnp.einsum("ek,...k->...e", ew, last,
                           precision=precision)[..., ::-1]
        y = jnp.concatenate([lead, center, trail], axis=-1)
        y = y * jnp.asarray(dt_inv, dtype=x.dtype)
        return y.astype(restore) if restore is not None else y
    else:
        mode = _PAD_MODE[boundary]
        B = 1
        for s in x.shape[:-1]:
            B *= s
        if (method in ("pallas", "bf16") and n >= 1
                and B >= _mxu_min_batch_pad()
                and jax.default_backend() == "tpu"):
            # wide batches: boundary pad fused into the banded-MXU kernel
            # (the jnp.pad copy of the full input costs a whole HBM pass)
            op = _pallas_pad_diff(n, mode,
                                  "bf16" if method == "bf16" else "exact")
            y = op(x, center_w, jnp.asarray(dt_inv, dtype=x.dtype))
            return y.astype(restore) if restore is not None else y
        pad = [(0, 0)] * (x.ndim - 1) + [(n, n)]
        xp = jnp.pad(x, pad, mode=mode)
        if method == "pallas":
            y = _pallas_corr_diff()(xp, center_w)
        elif method == "bf16":
            y = _pallas_corr_diff("bf16")(xp, center_w)
        elif method == "mxu":
            y = correlate_valid_mxu(xp, center_w, precision)
        else:
            y = correlate_valid(xp, center_w, precision)
    y = y * jnp.asarray(dt_inv, dtype=x.dtype)
    return y.astype(restore) if restore is not None else y


def savgol_apply(
    x: jax.Array,
    center_w: jax.Array,
    edge_w: Optional[jax.Array] = None,
    *,
    half_window: int,
    boundary: BoundaryMode = BoundaryMode.POLYNOMIAL,
    dt_inv: float | jax.Array = 1.0,
    derivative: int = 0,
    reference_edge_sign: bool = False,
    axis: int = -1,
    use_pallas: bool = False,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Apply a precomputed Savitzky-Golay filter along ``axis`` of ``x``.

    Equivalent of ``savgol_apply`` (src/savgolFilter.c:743) generalized to ND
    arrays; the ``axis`` argument is the idiomatic replacement for
    ``savgol_apply_strided``.
    """
    xl, moved = _move_axis_last(x, axis)
    y = savgol_apply_core(
        xl, center_w, edge_w, half_window, boundary, dt_inv,
        derivative=derivative, reference_edge_sign=reference_edge_sign,
        use_pallas=use_pallas, method=method, precision=precision)
    return _restore_axis(y, moved)


def savgol_apply_valid(
    x: jax.Array,
    center_w: jax.Array,
    *,
    half_window: int,
    dt_inv: float | jax.Array = 1.0,
    axis: int = -1,
    use_pallas: bool = False,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """VALID-mode apply: only positions with a full window; output length
    N - 2*half_window (src/savgolFilter.c:821-850)."""
    if use_pallas:
        method = "pallas"
    n = int(half_window)
    ws = 2 * n + 1
    method = _resolve_method(method, ws)
    if method not in ("xla", "pallas", "mxu", "bf16"):
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'mxu' or 'bf16', "
            f"got {method!r}")
    xl, moved = _move_axis_last(x, axis)
    if xl.shape[-1] < ws:
        raise ValueError(
            f"data length ({xl.shape[-1]}) must be >= window size ({ws})")
    if jnp.issubdtype(xl.dtype, jnp.complexfloating):
        y = _complex_split(
            lambda v: savgol_apply_valid(
                v, center_w, half_window=half_window, dt_inv=dt_inv,
                method=method, precision=precision), xl)
        return _restore_axis(y, moved)
    xl = _ensure_float(xl, center_w)
    xl, restore = _compute_dtype(xl)
    if method == "pallas":
        y = _pallas_corr_diff()(xl, center_w)
    elif method == "bf16":
        y = _pallas_corr_diff("bf16")(xl, center_w)
    elif method == "mxu":
        y = correlate_valid_mxu(xl, center_w, precision)
    else:
        y = correlate_valid(xl, center_w, precision)
    y = y * jnp.asarray(dt_inv, dtype=xl.dtype)
    if restore is not None:
        y = y.astype(restore)
    return _restore_axis(y, moved)


def correlate_valid_mxu(x: jax.Array, w: jax.Array,
                        precision=lax.Precision.HIGHEST) -> jax.Array:
    """Valid cross-correlation as banded matmuls on the MXU.

    The taps of a (2n+1)-point stencil only ever straddle two adjacent
    128-column lane blocks, so the correlation factors into two STATIONARY
    banded (128, 128) matrices:

        out[b, i, p] = sum_q x[b, i, q] W1[q, p] + x[b, i+1, q] W2[q, p]
        W1[q, p] = w[q - p]        (0 <= q - p <= 2n)
        W2[q, p] = w[q + 128 - p]  (same band, wrapped into the next block)

    On TPU this runs on the systolic array instead of the VPU: ~5x the
    FLOPs of the direct method but ~16x the FLOP rate, and the band
    matrices are reused across the whole array (weight-stationary). Exact
    to HIGHEST-precision matmul accuracy (~1e-7 relative).
    """
    ws = w.shape[0]
    if ws > 129:
        raise ValueError("window too wide for the two-block band structure")
    batch_shape = x.shape[:-1]
    N = x.shape[-1]
    n_out = N - ws + 1
    xb = x.reshape((-1, N))
    w = w.astype(x.dtype)

    L = 128
    nb = -(-n_out // L)                 # output blocks
    total = (nb + 1) * L                # block-aligned input incl. spillover
    xp = jnp.pad(xb, ((0, 0), (0, total - N)))
    xblk = xp.reshape((xb.shape[0], nb + 1, L))

    q = jnp.arange(L)[:, None]
    p = jnp.arange(L)[None, :]
    band1 = q - p
    band2 = q + L - p
    wpad = jnp.concatenate([w, jnp.zeros((1,), dtype=w.dtype)])
    W1 = jnp.where((band1 >= 0) & (band1 < ws),
                   wpad[jnp.clip(band1, 0, ws - 1)], 0.0).astype(x.dtype)
    W2 = jnp.where((band2 >= 0) & (band2 < ws),
                   wpad[jnp.clip(band2, 0, ws - 1)], 0.0).astype(x.dtype)

    cur = xblk[:, :nb, :]
    nxt = xblk[:, 1:nb + 1, :]
    out = (jnp.einsum("biq,qp->bip", cur, W1, precision=precision)
           + jnp.einsum("biq,qp->bip", nxt, W2, precision=precision))
    out = out.reshape((xb.shape[0], nb * L))[:, :n_out]
    return out.reshape(batch_shape + (n_out,))
