"""Multi-chip masked / nonuniform Savitzky-Golay: overlap-save sharding.

:mod:`savgol_tpu.parallel.sharded` shards the UNIFORM stencil paths; this
module extends the same overlap-save decomposition to the capability
paths whose per-position fit depends on runtime data — the halo carries
everything the local fit needs:

  * masked 1D/2D: (values, weights) — ``half_window`` samples (rows) of
    both ride one ``lax.ppermute`` pair each; the local shard then runs
    the SAME single-chip pipeline (fused Pallas kernels on TPU) with
    ``boundary="truncate"`` on the halo-extended block and keeps the
    interior.
  * nonuniform: (values, weights, abscissae) — offsets are formed
    locally from the raw ``t`` halo; invalid/wrapped abscissae are
    killed by the zero halo weights (ops/nonuniform.py sanitizes
    ``u`` centrally by ``w = 0``), never by value.

Global boundary semantics compose with the ring exactly as in the
uniform module:

  * ``"truncate"`` (default): the outer shards ZERO their outer halo
    weights — a zero-weight sample IS the truncate semantics, so no
    virtual values are needed.
  * PERIODIC: the wrap-around ring halo IS the periodic boundary; every
    shard runs identical code.
  * CONSTANT / REFLECT (masked paths): the outer shards synthesize the
    same edge/symmetric pads of the SANITIZED (values, weights) pair
    that the single-device path applies globally
    (ops/masked.py::savgol_apply_masked), from local data (requires
    local shard length >= half_window).

All paths are differentiable through the halo exchange (``ppermute``
has a transpose rule; the local fits carry their own custom VJPs) and
produce results equal to the single-device call on the gathered input
(tested on an 8-way virtual CPU mesh in tests/test_sharded_ext.py and
dry-run in __graft_entry__.dryrun_multichip).

Call these under ``jax.jit``. Eagerly, ``shard_map`` dispatches the
masked/nonuniform pipelines' hundreds of plane ops ONE AT A TIME across
the mesh (measured ~30 s for a call that compiles and runs in ~1 s
jitted on an 8-way virtual mesh).

No reference analog: the C reference (src/savgolFilter.c) is
single-process and uniform-grid only (SURVEY.md §2).
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from savgol_tpu.config import Boundary2D, BoundaryMode
from savgol_tpu.parallel.sharded import _halo_exchange

__all__ = ["masked_apply_sharded", "masked2d_apply_sharded",
           "nonuniform_apply_sharded"]

TRUNCATE = "truncate"


def _norm_boundary(boundary, enum, path: str):
    """'truncate' stays a string token; everything else coerces to the
    enum (string typos would otherwise silently mean CONSTANT)."""
    if isinstance(boundary, str) and boundary.lower() == TRUNCATE:
        return TRUNCATE
    b = enum(boundary)
    if b.name in ("POLYNOMIAL", "VALID"):
        raise ValueError(
            f"boundary={b.name.lower()!r} is not offered on the {path} "
            "path (same rule as the single-device API)")
    return b


def _sanitize(x, mask, extra_finite=None):
    """(xz, wts) in x's dtype: invalid samples -> value 0 / weight 0.

    Mirrors the single-device masked/nonuniform sanitization so the
    local shard call (which receives ``wts`` as its float mask) fits
    the identical weighted LS problem."""
    if mask is None:
        mask = jnp.isfinite(x)
        if extra_finite is not None:
            mask = mask & jnp.isfinite(extra_finite)
    if mask.shape != x.shape:
        raise ValueError(
            f"mask shape {mask.shape} != data shape {x.shape}")
    weighted = not jnp.issubdtype(mask.dtype, jnp.bool_)
    valid = (mask > 0) if weighted else mask
    wts = (jnp.where(valid, mask.astype(x.dtype), 0)
           if weighted else valid.astype(x.dtype))
    xz = jnp.where(valid, x, jnp.zeros((), x.dtype))
    return xz, wts


def _edge_virtuals(z, n, boundary, axis=-1):
    """Local synthesis of the outer-shard halo, matching the np.pad
    mode the single-device masked path applies globally (CONSTANT ->
    'edge', REFLECT -> 'symmetric'); truncate -> zeros (weight 0 IS
    out-of-range)."""
    if boundary == TRUNCATE:
        shape = list(z.shape)
        shape[axis] = n
        zero = jnp.zeros(shape, z.dtype)
        return zero, zero
    head = lax.slice_in_dim(z, 0, n, axis=axis)
    tail = lax.slice_in_dim(z, z.shape[axis] - n, z.shape[axis],
                            axis=axis)
    if boundary in (BoundaryMode.REFLECT, Boundary2D.REFLECT):
        return jnp.flip(head, axis=axis), jnp.flip(tail, axis=axis)
    # CONSTANT: clamp to the edge sample
    first = lax.slice_in_dim(z, 0, 1, axis=axis)
    last = lax.slice_in_dim(z, z.shape[axis] - 1, z.shape[axis],
                            axis=axis)
    reps = [1] * z.ndim
    reps[axis] = n
    return jnp.tile(first, reps), jnp.tile(last, reps)


def _extend(z, n, boundary, axis_name, axis=-1, periodic=False):
    """Halo-extend ``z`` by ``n`` on both sides of ``axis`` over the
    ring; outer shards substitute boundary virtuals unless periodic."""
    if axis == -1 or axis == z.ndim - 1:
        left, right = _halo_exchange(z, n, axis_name)
    else:                                    # rows: exchange along -2
        zt = jnp.swapaxes(z, axis, -1)
        lt, rt = _halo_exchange(zt, n, axis_name)
        left, right = (jnp.swapaxes(lt, axis, -1),
                       jnp.swapaxes(rt, axis, -1))
    if not periodic:
        idx = lax.axis_index(axis_name)
        size = lax.axis_size(axis_name)
        vleft, vright = _edge_virtuals(z, n, boundary, axis=axis)
        left = jnp.where(idx == 0, vleft, left)
        right = jnp.where(idx == size - 1, vright, right)
    return jnp.concatenate([left, z, right], axis=axis)


def _check_local(nloc, n, what):
    if nloc < max(2 * n + 1, n):
        raise ValueError(
            f"local {what} length ({nloc}) must be >= the window size "
            f"({2 * n + 1}); use fewer shards or longer input")


def masked_apply_sharded(
    x: jax.Array,
    *,
    half_window: int,
    poly_order: int,
    derivative: int = 0,
    time_step: float = 1.0,
    mask: Optional[jax.Array] = None,
    boundary: Union[str, BoundaryMode] = TRUNCATE,
    mesh: Mesh,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "batch",
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    solver: str = "normal",
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """:func:`savgol_tpu.ops.masked.savgol_apply_masked` (filter axis
    LAST) sharded along the sample axis over ``mesh[seq_axis]`` and
    optionally along the leading axis over ``mesh[batch_axis]``.

    The halo carries ``half_window`` samples of (sanitized values,
    weights) each way; each shard then runs the single-chip masked
    pipeline (the fused Pallas kernel on TPU) on its extended block.
    Results equal the single-device call; communication is four
    neighbor sends of ``half_window`` samples per shard.
    """
    boundary = _norm_boundary(boundary, BoundaryMode, "masked")
    n = int(half_window)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
        if mask is not None and mask.ndim == 1:
            mask = mask[None, :]
    if x.shape[-1] % mesh.shape[seq_axis] != 0:
        raise ValueError(
            f"sample axis ({x.shape[-1]}) must divide evenly over "
            f"{mesh.shape[seq_axis]} sequence shards")
    _check_local(x.shape[-1] // mesh.shape[seq_axis], n, "shard")
    xz, wts = _sanitize(x, mask)

    from savgol_tpu.ops.masked import savgol_apply_masked
    periodic = boundary is BoundaryMode.PERIODIC

    def body(xzl, wl):
        xp = _extend(xzl, n, boundary, seq_axis, periodic=periodic)
        wp = _extend(wl, n, boundary, seq_axis, periodic=periodic)
        y = savgol_apply_masked(
            xp, half_window=n, poly_order=poly_order,
            derivative=derivative, time_step=time_step, mask=wp,
            boundary=TRUNCATE, min_points=min_points, fill=fill,
            solver=solver, method=method, precision=precision)
        return y[..., n:-n]

    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and x.shape[0] % mesh.shape[batch_axis] == 0
                 and x.shape[0] >= mesh.shape[batch_axis])
    bspec = batch_axis if use_batch else None
    spec = P(*([bspec] + [None] * (x.ndim - 2) + [seq_axis]))
    y = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                      out_specs=spec, check_vma=False)(xz, wts)
    return y[0] if squeeze else y


def nonuniform_apply_sharded(
    x: jax.Array,
    t: jax.Array,
    *,
    half_window: int,
    poly_order: int,
    derivative: int = 0,
    mask: Optional[jax.Array] = None,
    mesh: Mesh,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "batch",
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    rcond: Optional[float] = None,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """:func:`savgol_tpu.ops.nonuniform.savgol_apply_nonuniform`
    (filter axis LAST) sharded along the sample axis.

    The halo carries (values, weights, raw abscissae) — six neighbor
    sends of ``half_window`` samples per shard; the outer shards zero
    their halo WEIGHTS (truncate semantics), so the wrapped abscissae
    need no fixup (invalid taps are killed centrally by ``w = 0``).
    Each shard runs the single-chip pipeline — the fused dd-moment
    Pallas kernel on TPU — on its extended block.
    """
    n = int(half_window)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    t = jnp.asarray(t)
    if not jnp.issubdtype(t.dtype, jnp.floating):
        t = t.astype(x.dtype)
    if t.ndim == 1:
        t = jnp.broadcast_to(t, x.shape)
    if t.shape != x.shape:
        raise ValueError(
            f"t shape {t.shape} is neither x's shape {x.shape} nor "
            f"(x.shape[-1],)")
    if mask is not None and squeeze and mask.ndim == 1:
        mask = mask[None, :]
    if x.shape[-1] % mesh.shape[seq_axis] != 0:
        raise ValueError(
            f"sample axis ({x.shape[-1]}) must divide evenly over "
            f"{mesh.shape[seq_axis]} sequence shards")
    _check_local(x.shape[-1] // mesh.shape[seq_axis], n, "shard")
    xz, wts = _sanitize(x, mask, extra_finite=t)

    from savgol_tpu.ops.nonuniform import savgol_apply_nonuniform

    def body(xzl, wl, tl):
        xp = _extend(xzl, n, TRUNCATE, seq_axis)
        wp = _extend(wl, n, TRUNCATE, seq_axis)
        # halo abscissae ride RAW; the outer shards' zeroed halo
        # weights make the wrapped values unreachable
        tp = _extend(tl, n, TRUNCATE, seq_axis, periodic=True)
        y = savgol_apply_nonuniform(
            xp, tp, half_window=n, poly_order=poly_order,
            derivative=derivative, mask=wp, min_points=min_points,
            fill=fill, rcond=rcond, method=method, precision=precision)
        return y[..., n:-n]

    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and x.shape[0] % mesh.shape[batch_axis] == 0
                 and x.shape[0] >= mesh.shape[batch_axis])
    bspec = batch_axis if use_batch else None
    spec = P(*([bspec] + [None] * (x.ndim - 2) + [seq_axis]))
    y = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=spec, check_vma=False)(xz, wts, t)
    return y[0] if squeeze else y


def masked2d_apply_sharded(
    x: jax.Array,
    *,
    half_window_x: int,
    half_window_y: int,
    poly_order: int,
    deriv_x: int = 0,
    deriv_y: int = 0,
    delta_x: float = 1.0,
    delta_y: float = 1.0,
    mask: Optional[jax.Array] = None,
    boundary: Union[str, Boundary2D] = TRUNCATE,
    mesh: Mesh,
    row_axis: str = "rows",
    batch_axis: Optional[str] = None,
    min_points: Optional[int] = None,
    fill: float = float("nan"),
    rcond: Optional[float] = None,
    method: str = "auto",
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """:func:`savgol_tpu.ops.masked.savgol2d_apply_masked` ROW-sharded
    over ``mesh[row_axis]`` (image rows = axis -2).

    The halo carries ``half_window_y`` rows of (values, weights) each
    way; columns are fully local, so non-truncate boundaries pad them
    locally with the same edge/symmetric/wrap modes the single-device
    path applies globally, and the row ring supplies the row pads
    (outer shards synthesize theirs, PERIODIC wraps natively).
    """
    boundary = _norm_boundary(boundary, Boundary2D, "masked 2D")
    nx, ny = int(half_window_x), int(half_window_y)
    if x.shape[-2] % mesh.shape[row_axis] != 0:
        raise ValueError(
            f"row axis ({x.shape[-2]}) must divide evenly over "
            f"{mesh.shape[row_axis]} row shards")
    _check_local(x.shape[-2] // mesh.shape[row_axis], ny, "row-shard")
    xz, wts = _sanitize(x, mask)

    from savgol_tpu.ops.apply2d import _PAD_MODE_2D
    from savgol_tpu.ops.masked import savgol2d_apply_masked
    periodic = boundary is Boundary2D.PERIODIC

    def body(xzl, wl):
        if boundary != TRUNCATE:
            # local column pads FIRST, so the row halos (and the outer
            # shards' row virtuals) carry col-padded rows — sequential
            # edge/symmetric/wrap padding equals np.pad's joint corners
            mode = _PAD_MODE_2D[boundary]
            cpad = [(0, 0)] * (xzl.ndim - 1) + [(nx, nx)]
            xzl = jnp.pad(xzl, cpad, mode=mode)
            wl = jnp.pad(wl, cpad, mode=mode)
        xp = _extend(xzl, ny, boundary, row_axis, axis=-2,
                     periodic=periodic)
        wp = _extend(wl, ny, boundary, row_axis, axis=-2,
                     periodic=periodic)
        y = savgol2d_apply_masked(
            xp, half_window_x=nx, half_window_y=ny,
            poly_order=poly_order, deriv_x=deriv_x, deriv_y=deriv_y,
            delta_x=delta_x, delta_y=delta_y, mask=wp,
            boundary=TRUNCATE, min_points=min_points, fill=fill,
            rcond=rcond, method=method, precision=precision)
        y = y[..., ny:-ny, :]
        return y[..., nx:-nx] if boundary != TRUNCATE else y

    nbatch = x.ndim - 2
    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and nbatch >= 1
                 and x.shape[0] % mesh.shape[batch_axis] == 0
                 and x.shape[0] >= mesh.shape[batch_axis])
    bspec = [batch_axis if use_batch else None] * min(1, nbatch)
    spec = P(*(bspec + [None] * (nbatch - len(bspec))
               + [row_axis, None]))
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec, check_vma=False)(xz, wts)
