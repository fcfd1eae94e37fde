"""Multi-chip 2D Savitzky-Golay: row-sharded and (rows x cols)-tiled
overlap-save.

Images are sharded along the row axis over the mesh's sequence dimension
(and optionally along the column axis over a second mesh dimension —
pass ``col_axis``); each shard exchanges ``half_window_y`` halo rows
(/ ``half_window_x`` halo columns) with its neighbors via
``lax.ppermute`` (ICI ring) and then runs the dense local stencil. The
outermost shards synthesize virtual rows/columns per the boundary mode
(CONSTANT clamps, REFLECT mirrors with edge duplication — matching
/root/reference/src/savgol2d.c:417-453); PERIODIC keeps the exchanged
ring halo as-is — the wrap IS the boundary, matching parallel/sharded.py
(under two-axis tiling the mesh is a torus). In the tiled layout the
column exchange runs FIRST and the row exchange ships the
column-extended tile, so each corner arrives transitively from the
diagonal neighbor with no explicit corner message.
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


def _halo_cols(x_local, nx: int, axis_name: str):
    size = lax.axis_size(axis_name)
    right = [(i, (i + 1) % size) for i in range(size)]
    left = [(i, (i - 1) % size) for i in range(size)]
    left_halo = lax.ppermute(x_local[..., :, -nx:], axis_name, perm=right)
    right_halo = lax.ppermute(x_local[..., :, :nx], axis_name, perm=left)
    return left_halo, right_halo


def _exchange_rows(x_local, ny, axis_name, halo):
    if halo == "rdma":
        from savgol_tpu.parallel.ici_halo import halo_exchange_rdma_rows
        return halo_exchange_rdma_rows(x_local, ny, axis_name)
    return _halo_rows(x_local, ny, axis_name)


def _exchange_cols(x_local, nx, axis_name, halo):
    if halo == "rdma":
        # reuse the row-halo remote-DMA ring (and its custom VJP) on the
        # locally transposed tile — a transpose is shard-local
        from savgol_tpu.parallel.ici_halo import halo_exchange_rdma_rows
        xt = jnp.swapaxes(x_local, -1, -2)
        lt, rt = halo_exchange_rdma_rows(xt, nx, axis_name)
        return jnp.swapaxes(lt, -1, -2), jnp.swapaxes(rt, -1, -2)
    return _halo_cols(x_local, nx, axis_name)


def _local2d_tiled(x_local, weights, scale, boundary, row_axis: str,
                   col_axis: str, method="xla", halo="ppermute"):
    """Local compute for the (rows x cols)-tiled layout.

    Column halos are exchanged FIRST on the raw tile; the row exchange
    then ships the column-extended tile, so corner pixels arrive
    transitively from the diagonal neighbors. Outer shards overwrite the
    wrapped halo with boundary-synthesized values (except PERIODIC,
    where the torus wrap IS the boundary). The local stencil then runs
    in VALID mode over the fully extended tile — no jnp.pad copy."""
    from savgol_tpu.ops.apply2d import (_corr2d_pallas_dispatch,
                                        correlate2d_valid)

    H, W = weights.shape[-2:]
    ny, nx = (H - 1) // 2, (W - 1) // 2
    rloc, cloc = x_local.shape[-2:]
    if rloc < H:
        raise ValueError(
            f"local row count ({rloc}) must be >= window height ({H})")
    if cloc < W:
        raise ValueError(
            f"local column count ({cloc}) must be >= window width ({W})")

    ridx = lax.axis_index(row_axis)
    rsize = lax.axis_size(row_axis)
    cidx = lax.axis_index(col_axis)
    csize = lax.axis_size(col_axis)

    # --- columns first -----------------------------------------------------
    left, right = _exchange_cols(x_local, nx, col_axis, halo)
    if boundary is not Boundary2D.PERIODIC:
        if boundary is Boundary2D.REFLECT:
            vleft = x_local[..., :, :nx][..., :, ::-1]
            vright = x_local[..., :, -nx:][..., :, ::-1]
        else:  # CONSTANT (and VALID: these columns are trimmed globally)
            vleft = jnp.broadcast_to(x_local[..., :, :1], left.shape)
            vright = jnp.broadcast_to(x_local[..., :, -1:], right.shape)
        left = jnp.where(cidx == 0, vleft, left)
        right = jnp.where(cidx == csize - 1, vright, right)
    xc = jnp.concatenate([left, x_local, right], axis=-1)

    # --- rows of the column-extended tile (corners ride along) -------------
    top, bot = _exchange_rows(xc, ny, row_axis, halo)
    if boundary is not Boundary2D.PERIODIC:
        if boundary is Boundary2D.REFLECT:
            vtop = xc[..., :ny, :][..., ::-1, :]
            vbot = xc[..., -ny:, :][..., ::-1, :]
        else:
            vtop = jnp.broadcast_to(xc[..., :1, :], top.shape)
            vbot = jnp.broadcast_to(xc[..., -1:, :], bot.shape)
        top = jnp.where(ridx == 0, vtop, top)
        bot = jnp.where(ridx == rsize - 1, vbot, bot)
    xr = jnp.concatenate([top, xc, bot], axis=-2)

    if method == "pallas":
        y = _corr2d_pallas_dispatch(xr, weights.astype(xr.dtype))
    elif method == "bf16":
        from savgol_tpu.ops.apply2d import _pallas_rowmxu_bf16_diff
        y = _pallas_rowmxu_bf16_diff()(xr, weights.astype(jnp.float32))
    else:
        y = correlate2d_valid(xr, weights)              # (rloc, cloc)
    return y * jnp.asarray(scale, dtype=y.dtype)


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
    col_axis: Optional[str] = None,
    method: str = "auto",
    halo: str = "ppermute",
) -> jax.Array:
    """2D filter with rows sharded over ``mesh[seq_axis]`` — and, when
    ``col_axis`` names a second mesh dimension, columns tiled over it.

    ``x``: (..., R, C) or (R, C). VALID mode shrinks columns locally but
    keeps the row count (rows lose nothing because halo rows supply the
    support; callers wanting the fully-VALID output slice rows
    [ny : R-ny] afterwards — done here automatically for unsharded-row
    semantics parity). Under two-axis tiling the VALID column trim is
    applied globally too.

    ``halo`` selects the halo exchange implementation: ``"ppermute"``
    (default, XLA collectives) or ``"rdma"`` (Pallas
    ``make_async_remote_copy`` ring — see
    :mod:`savgol_tpu.parallel.ici_halo`); both produce identical results.
    """
    from savgol_tpu.ops.apply2d import _resolve_method2d

    if halo not in ("ppermute", "rdma"):
        raise ValueError(f"halo must be 'ppermute' or 'rdma', got {halo!r}")
    if halo == "rdma" and col_axis is not None \
            and jax.default_backend() != "tpu":
        # Pallas' interpret-mode DMA discharge only handles single-axis
        # meshes (jax dma_start_p: "Meshes with more than 1 named
        # dimension not implemented") — the hardware path uses MESH dict
        # ids and composes fine, but there is nothing to emulate it on.
        raise NotImplementedError(
            "halo='rdma' with two-axis tiling needs real TPU devices; "
            "interpret mode cannot discharge remote DMA on a multi-axis "
            "mesh — use halo='ppermute' off-hardware")
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
    R, C = x.shape[-2:]
    S = mesh.shape[seq_axis]
    if R % S != 0:
        raise ValueError(f"row count ({R}) must divide evenly over {S} "
                         "row shards")
    tiled = col_axis is not None
    if tiled:
        if col_axis not in mesh.shape:
            raise ValueError(f"col_axis {col_axis!r} is not a mesh "
                             f"dimension of {tuple(mesh.shape)}")
        Sc = mesh.shape[col_axis]
        if C % Sc != 0:
            raise ValueError(f"column count ({C}) must divide evenly "
                             f"over {Sc} column shards")

    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and x.shape[0] % mesh.shape[batch_axis] == 0)
    bspec = batch_axis if use_batch else None
    in_spec = P(*([bspec] + [None] * (x.ndim - 3)
                  + [seq_axis, col_axis if tiled else None]))

    if tiled:
        fn = functools.partial(_local2d_tiled, weights=weights,
                               scale=scale, boundary=boundary,
                               row_axis=seq_axis, col_axis=col_axis,
                               method=method, halo=halo)
    else:
        fn = functools.partial(_local2d, weights=weights, scale=scale,
                               boundary=boundary, axis_name=seq_axis,
                               method=method, halo=halo)
    y = jax.shard_map(fn, mesh=mesh, in_specs=(in_spec,),
                      out_specs=in_spec, check_vma=False)(x)
    if boundary is Boundary2D.VALID:
        # outputs computed against synthesized halo at the global edges
        # are not valid; drop them to match the unsharded VALID output
        y = y[..., ny:R - ny, nx:C - nx] if tiled else y[..., ny:R - ny, :]
    if squeeze:
        y = y[0]
    return y
