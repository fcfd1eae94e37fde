"""Multi-chip 2D Savitzky-Golay: row-sharded overlap-save.

Images are sharded along the row axis over the mesh's sequence dimension;
each shard exchanges ``half_window_y`` halo rows with its neighbors via
``lax.ppermute`` (ICI ring) and then runs the dense local stencil. The
outermost shards synthesize virtual rows per the boundary mode (CONSTANT
clamps, REFLECT mirrors with edge duplication — matching
/root/reference/src/savgol2d.c:417-453); PERIODIC keeps the exchanged
ring halo as-is — the wrap IS the boundary, matching parallel/sharded.py.
Column boundaries are handled locally (every shard holds full rows).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from savgol_tpu.config import Boundary2D

__all__ = ["apply2d_sharded"]


def _halo_rows(x_local, ny: int, axis_name: str):
    size = lax.axis_size(axis_name)
    down = [(i, (i + 1) % size) for i in range(size)]
    up = [(i, (i - 1) % size) for i in range(size)]
    top_halo = lax.ppermute(x_local[..., -ny:, :], axis_name, perm=down)
    bot_halo = lax.ppermute(x_local[..., :ny, :], axis_name, perm=up)
    return top_halo, bot_halo


def _local2d(x_local, weights, scale, boundary, axis_name, method="xla",
             halo="ppermute"):
    from savgol_tpu.ops.apply2d import (_corr2d_pallas_dispatch,
                                        correlate2d_valid)

    H, W = weights.shape[-2:]
    ny, nx = (H - 1) // 2, (W - 1) // 2
    rloc = x_local.shape[-2]
    if rloc < H:
        raise ValueError(
            f"local row count ({rloc}) must be >= window height ({H})")

    idx = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    is_first = idx == 0
    is_last = idx == size - 1

    if halo == "rdma":
        from savgol_tpu.parallel.ici_halo import halo_exchange_rdma_rows
        top, bot = halo_exchange_rdma_rows(x_local, ny, axis_name)
    else:
        top, bot = _halo_rows(x_local, ny, axis_name)
    # Outer shards: replace the wrapped halo with virtual rows. PERIODIC
    # keeps the exchanged rows as-is — the shard ring IS the wrap-around
    # (same design as the 1D PERIODIC shard ring in parallel/sharded.py).
    if boundary is not Boundary2D.PERIODIC:
        if boundary is Boundary2D.REFLECT:
            vtop = x_local[..., :ny, :][..., ::-1, :]
            vbot = x_local[..., -ny:, :][..., ::-1, :]
        else:  # CONSTANT (and VALID, where halo rows are discarded anyway)
            vtop = jnp.broadcast_to(x_local[..., :1, :], top.shape)
            vbot = jnp.broadcast_to(x_local[..., -1:, :], bot.shape)
        top = jnp.where(is_first, vtop, top)
        bot = jnp.where(is_last, vbot, bot)

    xr = jnp.concatenate([top, x_local, bot], axis=-2)
    # Columns are local: pad per boundary mode (or VALID -> shrink later).
    if boundary is not Boundary2D.VALID:
        from savgol_tpu.ops.apply2d import _PAD_MODE_2D
        pad = [(0, 0)] * (xr.ndim - 1) + [(nx, nx)]
        xr = jnp.pad(xr, pad, mode=_PAD_MODE_2D[boundary])
    if method == "pallas":
        y = _corr2d_pallas_dispatch(xr, weights.astype(xr.dtype))
    elif method == "bf16":
        from savgol_tpu.ops.apply2d import _pallas_rowmxu_bf16_diff
        y = _pallas_rowmxu_bf16_diff()(xr, weights.astype(jnp.float32))
    else:
        y = correlate2d_valid(xr, weights)  # rows: rloc, cols: C or C-2nx
    return y * jnp.asarray(scale, dtype=y.dtype)


def apply2d_sharded(
    x: jax.Array,
    weights: jax.Array,
    *,
    mesh: Mesh,
    boundary: Boundary2D = Boundary2D.CONSTANT,
    scale: float | jax.Array = 1.0,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "batch",
    method: str = "auto",
    halo: str = "ppermute",
) -> jax.Array:
    """2D filter with rows sharded over ``mesh[seq_axis]``.

    ``x``: (..., R, C) or (R, C). VALID mode shrinks columns locally but
    keeps the row count (rows lose nothing because halo rows supply the
    support; callers wanting the fully-VALID output slice rows
    [ny : R-ny] afterwards — done here automatically for unsharded-row
    semantics parity).

    ``halo`` selects the row-halo exchange implementation: ``"ppermute"``
    (default, XLA collectives) or ``"rdma"`` (Pallas
    ``make_async_remote_copy`` ring — see
    :mod:`savgol_tpu.parallel.ici_halo`); both produce identical results.
    """
    from savgol_tpu.ops.apply2d import _resolve_method2d

    if halo not in ("ppermute", "rdma"):
        raise ValueError(f"halo must be 'ppermute' or 'rdma', got {halo!r}")
    method = _resolve_method2d(method, use_pallas=False)
    if not isinstance(boundary, Boundary2D):
        # same string coercion as savgol2d_apply — a string would skip the
        # VALID row trim and silently route to CONSTANT halo synthesis
        boundary = Boundary2D(boundary)
    H, W = weights.shape[-2:]
    ny, nx = (H - 1) // 2, (W - 1) // 2
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    R = x.shape[-2]
    S = mesh.shape[seq_axis]
    if R % S != 0:
        raise ValueError(f"row count ({R}) must divide evenly over {S} "
                         "row shards")

    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and x.shape[0] % mesh.shape[batch_axis] == 0)
    bspec = batch_axis if use_batch else None
    in_spec = P(*([bspec] + [None] * (x.ndim - 3) + [seq_axis, None]))

    fn = functools.partial(_local2d, weights=weights, scale=scale,
                           boundary=boundary, axis_name=seq_axis,
                           method=method, halo=halo)
    y = jax.shard_map(fn, mesh=mesh, in_specs=(in_spec,),
                      out_specs=in_spec, check_vma=False)(x)
    if boundary is Boundary2D.VALID:
        # rows computed with zero/wrapped halo at the global edges are not
        # valid; drop them to match the unsharded VALID output
        y = y[..., ny:R - ny, :]
    if squeeze:
        y = y[0]
    return y
