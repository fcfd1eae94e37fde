"""2D Savitzky-Golay application: true 2D polynomial least-squares filtering.

Semantics match the reference (/root/reference/src/savgol2d.c:356-456):

  * VALID: output shrinks by 2*half_window in each dimension;
  * CONSTANT: out-of-range taps clamp to the nearest edge pixel
    (jnp.pad mode 'edge');
  * REFLECT: mirrored with the edge pixel duplicated
    (jnp.pad mode 'symmetric');
  * outputs scaled by 1 / (delta_x**dx * delta_y**dy)
    (src/savgol2d.c:320-322).

The gradient / Hessian / Laplacian conveniences
(src/savgol2d.c:462-618) are implemented idiomatically: all requested
derivative stencils are stacked as output channels of ONE convolution
instead of the reference's create-apply-destroy per derivative, so a full
Hessian costs a single fused conv pass over the image.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from savgol_tpu.config import Boundary2D, Savgol2DConfig
# hashable stencil-bytes key shared with the kernel caches (normalizes
# dtype to f64 and copies, so distinct-dtype aliases cannot collide)
from savgol_tpu.ops.pallas_conv import _WKey as _WeightKey
from savgol_tpu.ops.weights import savgol2d_weights_np

__all__ = [
    "correlate2d_valid",
    "savgol2d_apply",
    "savgol2d_apply_stack",
    "savgol2d_gradient",
    "savgol2d_hessian",
    "savgol2d_laplacian",
]

_PAD_MODE_2D = {
    Boundary2D.CONSTANT: "edge",
    Boundary2D.REFLECT: "symmetric",
    Boundary2D.PERIODIC: "wrap",
}


def _resolve_method2d(method: str, use_pallas: bool) -> str:
    """'auto' -> the VPU stencil kernel on TPU (exact f32, ~5x the XLA
    HIGHEST conv), plain XLA elsewhere (Pallas would run interpreted).
    'sep' runs the SVD rank-decomposed kernel (r*(H+W) taps instead of
    H*W; exact for polynomial stencils) — requires concrete weights.
    'bf16' runs the row-banded MXU kernel on bfloat16 operands at
    single-pass precision (~3.4x the exact rate, <=5e-3 relative)."""
    if use_pallas:
        method = "pallas"
    if method == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if method not in ("xla", "pallas", "sep", "bf16"):
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'sep' or 'bf16', "
            f"got {method!r}")
    return method


@functools.lru_cache(maxsize=256)
def _pallas_dense_const_diff(w_key):
    """Differentiable (in x) dense 2D kernel with the stencil baked as
    compile-time constants (~1.6x the runtime-SMEM-taps form on v5e)."""
    w = np.asarray(w_key.array)

    @jax.custom_vjp
    def op(x):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.correlate2d_valid_pallas(x, jnp.asarray(
            w, dtype=x.dtype))

    def fwd(x):
        return op(x), x

    def bwd(x, g):
        _, vjp = jax.vjp(
            lambda v: correlate2d_valid(v, jnp.asarray(w, dtype=v.dtype)), x)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=256)
def _pallas_same_const_diff(w_key, pad_mode: str, ny: int, nx: int):
    """Differentiable (in x) same-size 2D apply with boundary pad, tile
    pad, and (pre-folded) scale fused into one kernel invocation."""
    w = np.asarray(w_key.array)

    @jax.custom_vjp
    def op(x):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.savgol2d_same_pallas(x, w, pad_mode)

    def fwd(x):
        return op(x), x

    def bwd(x, g):
        def xla_twin(v):
            mode = pad_mode
            pad = [(0, 0)] * (v.ndim - 2) + [(ny, ny), (nx, nx)]
            return correlate2d_valid(jnp.pad(v, pad, mode=mode),
                                     jnp.asarray(w, dtype=v.dtype))

        _, vjp = jax.vjp(xla_twin, x)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def _corr2d_pallas_dispatch(x, weights):
    """Pallas dense 2D correlation: baked-constant kernel when the stencil
    is concrete (the common precomputed-filter case), runtime-SMEM kernel
    when traced (weights under jit/grad); mid/wide-band stencils route to
    the row-banded MXU kernel at HIGHEST (see _rowmxu_exact_band)."""
    H, W = weights.shape[-2:]
    if _rowmxu_exact_band(H, W):
        return _pallas_rowmxu_exact_diff()(x, weights)
    try:
        w_np = np.asarray(weights)
    except jax.errors.TracerArrayConversionError:
        return _pallas_corr2d_diff()(x, weights)
    return _pallas_dense_const_diff(_WeightKey(w_np))(x)


@functools.lru_cache(maxsize=256)
def _pallas_sep_diff(w_key):
    """Differentiable (in x) wrapper for the separable 2D kernel; the
    stencil is baked in as a static constant (its SVD happens on the
    host), so this route requires concrete weights."""
    w = np.asarray(w_key.array)

    @jax.custom_vjp
    def op(x):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.correlate2d_valid_pallas_sep(x, w)

    def fwd(x):
        return op(x), x

    def bwd(x, g):
        _, vjp = jax.vjp(
            lambda v: correlate2d_valid(v, jnp.asarray(w, dtype=v.dtype)), x)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def correlate2d_valid(x: jax.Array, w: jax.Array,
                      precision=lax.Precision.HIGHEST) -> jax.Array:
    """Valid 2D cross-correlation over the last two axes.

    ``x``: (..., R, C); ``w``: (K, H, W) stack of stencils or (H, W) single.
    Output: (..., K, R-H+1, C-W+1) (or without K for a 2D ``w``).
    """
    single = w.ndim == 2
    if single:
        w = w[None]
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(w.dtype)
    K, H, W = w.shape
    batch_shape = x.shape[:-2]
    R, C = x.shape[-2:]
    xb = x.reshape((-1, 1, R, C))
    out = lax.conv_general_dilated(
        xb,
        w.reshape((K, 1, H, W)).astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    out = out.reshape(batch_shape + (K, R - H + 1, C - W + 1))
    if single:
        out = out[..., 0, :, :]
    return out


# Exact-path mid/wide-band dispatch: the row-banded MXU kernel at HIGHEST
# (6-pass bf16) overtakes the dense const-baked VPU kernel once the
# stencil passes ~9-11 taps, measured THROUGH the API with chained
# k-difference + HLO kernel-marker asserts on v5e, three independent runs
# (benchmarks/probe_midband.py). Same-size rowmxu-vs-dense Gpix/s:
# 9x9 5.56/4.60, 11x11 4.65-4.71/3.30-3.54, 13x13 3.91-3.98/2.46-3.69,
# 17x17 3.27/1.35, 21x21 2.64-2.69/0.83, 25x25 2.31/0.60; VALID mode
# agrees (11x11 4.71/3.54). Err ~2-4e-7 relative vs the dense kernel.
# Round 2's reverted dispatch (d08d026) predates the input-side-shift
# kernel form + chained protocol; this band is the re-decided version.
# Threshold 11, not 9: the 9x9 margin (~10-20%) is within this dev
# chip's run variance; 11 wins by >=30% in every run and mode.
_ROWMXU_EXACT_MIN_WH = 11


def _rowmxu_exact_band(wh: int, ww: int) -> bool:
    """True when the exact 2D path should run the row-banded MXU kernel
    at HIGHEST instead of the dense VPU kernel / separable fallback."""
    if jax.default_backend() != "tpu":
        return False
    from savgol_tpu.ops import pallas_conv
    if wh > pallas_conv._HALO_R + 1 or ww > pallas_conv._LANES + 1:
        return False          # beyond the kernel's halo limits
    return max(wh, ww) >= _ROWMXU_EXACT_MIN_WH


@functools.lru_cache(maxsize=None)
def _pallas_rowmxu_exact_diff():
    """Differentiable exact-path wrapper: row-banded MXU kernel at
    HIGHEST precision (6-pass bf16 = exact f32). Weights may be traced."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.correlate2d_valid_pallas_rowmxu(
            x, w, mxu_precision=lax.Precision.HIGHEST)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate2d_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=256)
def _pallas_rowmxu_same_exact_diff(pad_mode: str, ny: int, nx: int):
    """Same-size exact rowmxu wrapper with the boundary pad fused into
    the tile pad (one jnp.pad total, as in the bf16 twin)."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.savgol2d_same_pallas_rowmxu(
            x, w, pad_mode, mxu_precision=lax.Precision.HIGHEST)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        def xla_twin(x, w):
            pad = [(0, 0)] * (x.ndim - 2) + [(ny, ny), (nx, nx)]
            return correlate2d_valid(jnp.pad(x, pad, mode=pad_mode), w)

        _, vjp = jax.vjp(xla_twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_rowmxu_stack_exact_diff():
    """Exact (HIGHEST) stacked rowmxu: ONE input pass feeds all K
    stencils. NOT on the dispatch path: measured 0.89-0.90x vs K single
    launches (compute-bound at HIGHEST; see savgol2d_apply_stack).
    Kept as a tested building block — the trade flips if HBM gets
    relatively slower or K grows far beyond the hessian-sized stacks."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        y = pallas_conv.correlate2d_valid_pallas_rowmxu_stack(
            x, w, mxu_precision=lax.Precision.HIGHEST)
        return jnp.moveaxis(y, 0, -3)   # (K, ..., R', C') -> (..., K, ...)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate2d_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_rowmxu_bf16_diff():
    """Differentiable wrapper for the 2D bf16 throughput mode: row-banded
    MXU kernel on bfloat16 operands at single-pass (DEFAULT) precision,
    f32 accumulation — ~3.4x the exact dense rate at a documented <=5e-3
    relative contract. Gradients flow through the exact XLA twin."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        # f32 inputs: emit the f32 accumulator straight from the kernel —
        # skips a separate whole-output up-cast pass. Other dtypes keep
        # the bf16 output + cast (f64 accumulate on bf16 operands is not
        # a Mosaic path we rely on).
        out_dt = jnp.float32 if x.dtype == jnp.float32 else None
        y = pallas_conv.correlate2d_valid_pallas_rowmxu(
            x.astype(jnp.bfloat16), w,
            mxu_precision=lax.Precision.DEFAULT, out_dtype=out_dt)
        return y.astype(x.dtype)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate2d_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=256)
def _pallas_rowmxu_same_bf16_diff(pad_mode: str, ny: int, nx: int):
    """Same-size 2D bf16 throughput mode with boundary pad + tile pad
    fused into ONE host pad before the row-banded MXU kernel (the split
    path copies the whole image twice). Gradients flow through the exact
    XLA twin (pad + valid correlation)."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        out_dt = jnp.float32 if x.dtype == jnp.float32 else None
        y = pallas_conv.savgol2d_same_pallas_rowmxu(
            x.astype(jnp.bfloat16), w, pad_mode,
            mxu_precision=lax.Precision.DEFAULT, out_dtype=out_dt)
        return y.astype(x.dtype)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        def xla_twin(x, w):
            pad = [(0, 0)] * (x.ndim - 2) + [(ny, ny), (nx, nx)]
            return correlate2d_valid(jnp.pad(x, pad, mode=pad_mode), w)

        _, vjp = jax.vjp(xla_twin, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_rowmxu_stack_bf16_diff():
    """bf16 throughput mode for (K, H, W) stencil stacks: ONE input pass
    feeds all K stencils (K separate kernel launches would re-read the
    image K times, forfeiting the memory-bound mode's point)."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        out_dt = jnp.float32 if x.dtype == jnp.float32 else None
        y = pallas_conv.correlate2d_valid_pallas_rowmxu_stack(
            x.astype(jnp.bfloat16), w,
            mxu_precision=lax.Precision.DEFAULT, out_dtype=out_dt)
        # (K, ..., R', C') -> (..., K, R', C') to match the conv layout
        return jnp.moveaxis(y, 0, -3).astype(x.dtype)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate2d_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


@functools.lru_cache(maxsize=None)
def _pallas_corr2d_diff():
    """Differentiable wrapper for the Pallas 2D stencil kernel (backward
    pass = VJP of the XLA conv; the op is bilinear)."""

    @jax.custom_vjp
    def op(x, w):
        from savgol_tpu.ops import pallas_conv
        return pallas_conv.correlate2d_valid_pallas(x, w)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda x, w: correlate2d_valid(x, w), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op



def _fold_wscale(w, scale, dtype):
    """Fold the 1/dt scale into the (tiny) stencil instead of paying a
    full output read+write; no-op for a concrete scale of exactly 1.0."""
    w = jnp.asarray(w, dtype=dtype)
    try:
        if float(np.asarray(scale)) == 1.0:
            return w
    except (TypeError, jax.errors.TracerArrayConversionError):
        pass
    return w * jnp.asarray(scale, dtype=dtype)


def _apply_scale(y, scale):
    """Multiply by scale unless it is concretely 1.0 — the no-op multiply
    otherwise costs a full read+write of the output (measured ~7% of the
    2D bf16 API wall on 2048^2 images)."""
    try:
        if float(np.asarray(scale)) == 1.0:
            return y
    except (TypeError, jax.errors.TracerArrayConversionError):
        pass
    return y * jnp.asarray(scale, dtype=y.dtype)

def _pad2d(x: jax.Array, ny: int, nx: int, boundary: Boundary2D) -> jax.Array:
    mode = _PAD_MODE_2D[boundary]
    pad = [(0, 0)] * (x.ndim - 2) + [(ny, ny), (nx, nx)]
    return jnp.pad(x, pad, mode=mode)


def savgol2d_apply(
    x: jax.Array,
    weights: jax.Array,
    *,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    scale: float | jax.Array = 1.0,
    use_pallas: bool = False,
    method: str = "auto",
) -> jax.Array:
    """Apply a (H, W) 2D stencil over the last two axes of ``x``.

    VALID shrinks the output; CONSTANT/REFLECT/PERIODIC keep the input
    shape (PERIODIC — wrap-around for cyclic/angular images — extends
    the reference's boundary set). Mirrors ``savgol2d_apply`` /
    ``savgol2d_apply_valid``
    (src/savgol2d.c:356-456). ``method="auto"`` (default) picks the VPU
    stencil kernel on TPU (exact f32; autodiff via the XLA twin's VJP)
    and the XLA conv elsewhere; ``use_pallas=True`` forces the kernel.
    """
    method = _resolve_method2d(method, use_pallas)
    if not isinstance(boundary, Boundary2D):
        # same string coercion Savgol2DConfig applies ("valid" etc.)
        boundary = Boundary2D(boundary)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        # real-linear filter: real/imag parts as one extra batch pair
        parts = jnp.stack([x.real, x.imag])
        y = savgol2d_apply(parts, weights, boundary=boundary, scale=scale,
                           method=method)
        return lax.complex(y[0], y[1])
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        # promote int/bool images: the Pallas paths cast the WEIGHTS to
        # x.dtype (fractional stencils would truncate to zero)
        x = x.astype(jnp.result_type(weights.dtype, jnp.float32))
    H, W = weights.shape[-2:]
    ny, nx = (H - 1) // 2, (W - 1) // 2
    if method == "pallas" and boundary is not Boundary2D.VALID:
        if _rowmxu_exact_band(H, W):
            # mid/wide band: row-banded MXU kernel at HIGHEST, boundary
            # pad fused into the tile pad, scale folded into the (tiny)
            # stencil; works for traced weights too
            mode = _PAD_MODE_2D[boundary]
            return _pallas_rowmxu_same_exact_diff(mode, ny, nx)(
                x, _fold_wscale(weights, scale, x.dtype))
        # fused same-size path: ONE pad (boundary + tile alignment) and the
        # scale folded into the baked stencil when both are concrete
        try:
            w_np = np.asarray(weights)
            s_np = float(np.asarray(scale))
        except (jax.errors.TracerArrayConversionError, TypeError):
            w_np = None
        if w_np is not None:
            mode = _PAD_MODE_2D[boundary]
            op = _pallas_same_const_diff(_WeightKey(w_np * s_np), mode,
                                         ny, nx)
            return op(x)
    if method == "bf16" and boundary is not Boundary2D.VALID:
        # fused same-size form: one pad instead of boundary pad + the
        # valid wrapper's tile pad (two full-image copies)
        y = _pallas_rowmxu_same_bf16_diff(
            _PAD_MODE_2D[boundary], ny, nx)(x, weights)
        return _apply_scale(y, scale)
    if boundary is not Boundary2D.VALID:
        x = _pad2d(x, ny, nx, boundary)
    if method == "bf16":
        y = _pallas_rowmxu_bf16_diff()(x, weights)
        return _apply_scale(y, scale)
    if method == "sep":
        try:
            w_np = np.asarray(weights)
        except jax.errors.TracerArrayConversionError:
            w_np = None          # traced weights: no host SVD possible
        if w_np is not None:
            y = _pallas_sep_diff(_WeightKey(w_np))(x)
            return _apply_scale(y, scale)
        method = "pallas"
    if method == "pallas":
        y = _corr2d_pallas_dispatch(x, weights)
    else:
        y = correlate2d_valid(x, weights)
    return _apply_scale(y, scale)


def savgol2d_apply_stack(
    x: jax.Array,
    weight_stack: jax.Array,
    *,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    scales: Optional[jax.Array] = None,
    use_pallas: bool = False,
    method: str = "auto",
) -> jax.Array:
    """Apply K stencils (K, H, W) in one conv; output (..., K, R', C')."""
    method = _resolve_method2d(method, use_pallas)
    if not isinstance(boundary, Boundary2D):
        # same string coercion as savgol2d_apply (a string previously
        # KeyError'd in _pad2d)
        boundary = Boundary2D(boundary)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        parts = jnp.stack([x.real, x.imag])
        y = savgol2d_apply_stack(parts, weight_stack, boundary=boundary,
                                 scales=scales, method=method)
        return lax.complex(y[0], y[1])
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        # promote int/bool images (see savgol2d_apply): weights and scales
        # must never be cast down to an integer dtype
        x = x.astype(jnp.result_type(weight_stack.dtype, jnp.float32))
    H, W = weight_stack.shape[-2:]
    ny, nx = (H - 1) // 2, (W - 1) // 2
    if boundary is not Boundary2D.VALID:
        x = _pad2d(x, ny, nx, boundary)
    if method == "bf16":
        y = _pallas_rowmxu_stack_bf16_diff()(x, weight_stack)
        if scales is not None:
            y = y * jnp.asarray(scales, dtype=y.dtype)[..., :, None, None]
        return y
    if method == "sep":
        try:
            w_np = np.asarray(weight_stack)
        except jax.errors.TracerArrayConversionError:
            w_np = None
        if w_np is not None:
            y = jnp.stack([_pallas_sep_diff(_WeightKey(w_np[k]))(x)
                           for k in range(w_np.shape[0])], axis=-3)
        else:
            method = "pallas"
    if method == "pallas":
        # Exact path: per-stencil dispatch, NOT the stacked kernel. The
        # stacked form's Kx input-reuse does not pay at HIGHEST — the
        # 6-pass bf16 matmuls are compute-bound and holding K output
        # tiles live costs more than the saved reads: K=3 13x13 stacks
        # measure 0.89-0.90x vs K single launches at every tile geometry
        # (benchmarks/probe_stack_tiles.py, chained k=16, 3 reps). The
        # memory-bound bf16 mode above is where stacking wins. The K
        # identical tile pads below CSE into one under jit.
        y = jnp.stack([_corr2d_pallas_dispatch(x, weight_stack[k])
                       for k in range(weight_stack.shape[0])], axis=-3)
    elif method == "xla":
        y = correlate2d_valid(x, weight_stack)
    if scales is not None:
        # y.dtype, not x.dtype (matches the bf16 branch): fractional
        # derivative scales must not truncate through an integer input
        y = y * jnp.asarray(scales, dtype=y.dtype)[..., :, None, None]
    return y


def _stencil_stack(half_window_x: int, half_window_y: int, poly_order: int,
                   derivs: Sequence[Tuple[int, int]],
                   delta_x: float, delta_y: float, dtype=np.float64):
    """Build a (K, H, W) stack of derivative stencils + their 1/dt scales."""
    ws, scales = [], []
    for dx, dy in derivs:
        cfg = Savgol2DConfig(half_window_x, half_window_y, poly_order,
                             deriv_x=dx, deriv_y=dy,
                             delta_x=delta_x, delta_y=delta_y)
        ws.append(savgol2d_weights_np(cfg, dtype=dtype))
        scales.append(cfg.scale)
    return np.stack(ws), np.asarray(scales, dtype=dtype)


def savgol2d_gradient(
    x: jax.Array, half_window_x: int, half_window_y: int, poly_order: int,
    *, delta_x: float = 1.0, delta_y: float = 1.0,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    use_pallas: bool = False,
    method: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """(dI/dx, dI/dy) via one stacked conv (ref: src/savgol2d.c:462-499)."""
    W, s = _stencil_stack(half_window_x, half_window_y, poly_order,
                          [(1, 0), (0, 1)], delta_x, delta_y)
    y = savgol2d_apply_stack(x, jnp.asarray(W), boundary=boundary,
                             scales=jnp.asarray(s), use_pallas=use_pallas,
                             method=method)
    return y[..., 0, :, :], y[..., 1, :, :]


def savgol2d_hessian(
    x: jax.Array, half_window_x: int, half_window_y: int, poly_order: int,
    *, delta_x: float = 1.0, delta_y: float = 1.0,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    use_pallas: bool = False,
    method: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(d2I/dx2, d2I/dxdy, d2I/dy2); requires poly_order >= 2
    (ref: src/savgol2d.c:501-558)."""
    if poly_order < 2:
        raise ValueError("hessian requires poly_order >= 2")
    W, s = _stencil_stack(half_window_x, half_window_y, poly_order,
                          [(2, 0), (1, 1), (0, 2)], delta_x, delta_y)
    y = savgol2d_apply_stack(x, jnp.asarray(W), boundary=boundary,
                             scales=jnp.asarray(s), use_pallas=use_pallas,
                             method=method)
    return y[..., 0, :, :], y[..., 1, :, :], y[..., 2, :, :]


def savgol2d_laplacian(
    x: jax.Array, half_window_x: int, half_window_y: int, poly_order: int,
    *, delta_x: float = 1.0, delta_y: float = 1.0,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    use_pallas: bool = False,
    method: str = "auto",
) -> jax.Array:
    """Laplacian d2I/dx2 + d2I/dy2; since both stencils share the window the
    sum is folded into ONE stencil before the conv — one pass instead of the
    reference's two applies + elementwise add (src/savgol2d.c:560-618)."""
    if poly_order < 2:
        raise ValueError("laplacian requires poly_order >= 2")
    W, s = _stencil_stack(half_window_x, half_window_y, poly_order,
                          [(2, 0), (0, 2)], delta_x, delta_y)
    fused = W[0] * s[0] + W[1] * s[1]
    return savgol2d_apply(x, jnp.asarray(fused), boundary=boundary,
                          use_pallas=use_pallas, method=method)
