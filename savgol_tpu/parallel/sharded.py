"""Multi-chip Savitzky-Golay: overlap-save sharding with halo exchange.

The reference is single-process (SURVEY.md §2: no parallelism anywhere; an
OpenMP build flag wired to nothing). The TPU-native scaling story is:

  * **Data parallel** over batch/channel axes: plain sharding annotations —
    XLA runs the convolution independently per shard, zero communication.
  * **Sequence parallel** over the sample axis: the filter is a local FIR
    stencil of radius ``half_window``, so a shard only needs ``n`` halo
    samples from each neighbor. ``shard_map`` + two ``lax.ppermute`` sends
    (one left, one right) ride the ICI ring; compute is then fully local —
    the classic overlap-save decomposition (SURVEY.md §5 long-context plan).

Boundary handling composes with the ring exchange:

  * PERIODIC maps *natively* onto the device ring — the wrap-around halo IS
    the periodic boundary; every shard runs the same code (no edge cases).
  * REFLECT / CONSTANT: the first/last shards overwrite their outer halo
    with locally synthesized virtual samples (requires local shard length
    >= half_window, asserted).
  * POLYNOMIAL: the first/last shards recompute their first/last ``n``
    outputs with the edge-weight matmul on their local window.

All four modes emit identical results to the single-device path (tested on
an 8-way virtual CPU mesh in tests/test_sharded.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from savgol_tpu.config import BoundaryMode

__all__ = ["apply_sharded", "make_mesh"]


def make_mesh(axis_names=("batch", "seq"), shape=None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default shape puts all devices on the LAST axis (sequence sharding);
    pass ``shape`` to split, e.g. ``(2, 4)`` for 2-way batch x 4-way
    sequence on 8 chips.
    """
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (ndev,)
    import numpy as np
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def _halo_exchange(x_local: jax.Array, n: int, axis_name: str):
    """Fetch n trailing samples from the left neighbor and n leading samples
    from the right neighbor over the ring (wrap-around).

    Returns (left_halo, right_halo), each (..., n)."""
    size = lax.axis_size(axis_name)
    # Send my RIGHT tail to my right neighbor -> arrives as their LEFT halo.
    right_perm = [(i, (i + 1) % size) for i in range(size)]
    left_halo = lax.ppermute(x_local[..., -n:], axis_name, perm=right_perm)
    # Send my LEFT head to my left neighbor -> arrives as their RIGHT halo.
    left_perm = [(i, (i - 1) % size) for i in range(size)]
    right_halo = lax.ppermute(x_local[..., :n], axis_name, perm=left_perm)
    return left_halo, right_halo


def _local_apply(x_local, center_w, edge_w, n, boundary, dt_inv, lead_sign,
                 axis_name, precision, method="xla", halo="ppermute"):
    """Per-shard body: halo exchange + local correlation + end-shard fixes.

    ``method`` is pre-resolved by the caller (no "auto" here): the local
    center correlation runs on the same fast path as the single-chip apply
    (Pallas VPU kernel / banded-MXU on TPU), so per-chip throughput inside
    ``shard_map`` matches single-chip."""
    from savgol_tpu.ops.apply import (_pallas_corr_diff, correlate_valid,
                                      correlate_valid_mxu)

    def corr(v, w):
        if method == "pallas":
            return _pallas_corr_diff()(v, w.astype(v.dtype))
        if method == "bf16":
            return _pallas_corr_diff("bf16")(v, w.astype(v.dtype))
        if method == "mxu":
            return correlate_valid_mxu(v, w, precision)
        return correlate_valid(v, w, precision)

    ws = 2 * n + 1
    nloc = x_local.shape[-1]
    if nloc < ws:
        raise ValueError(
            f"local shard length ({nloc}) must be >= window size ({ws}); "
            "use fewer sequence shards or longer input")

    idx = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    is_first = idx == 0
    is_last = idx == size - 1

    if halo == "rdma":
        from savgol_tpu.parallel.ici_halo import halo_exchange_rdma
        left, right = halo_exchange_rdma(x_local, n, axis_name)
    else:
        left, right = _halo_exchange(x_local, n, axis_name)

    if boundary is not BoundaryMode.PERIODIC:
        # Outer shards see wrapped (wrong) halos; substitute local virtual
        # samples (REFLECT duplicates the edge sample — numpy 'symmetric',
        # matching src/savgolFilter.c:452-463; CONSTANT clamps).
        if boundary is BoundaryMode.REFLECT:
            vleft = x_local[..., :n][..., ::-1]
            vright = x_local[..., -n:][..., ::-1]
        else:  # CONSTANT and POLYNOMIAL (placeholder; replaced below)
            vleft = jnp.broadcast_to(x_local[..., :1], left.shape)
            vright = jnp.broadcast_to(x_local[..., -1:], right.shape)
        left = jnp.where(is_first, vleft, left)
        right = jnp.where(is_last, vright, right)

    xp = jnp.concatenate([left, x_local, right], axis=-1)
    y = corr(xp, center_w)                              # (..., nloc)

    if boundary is BoundaryMode.POLYNOMIAL:
        ew = edge_w.astype(x_local.dtype)
        first_win = x_local[..., :ws][..., ::-1]
        lead = jnp.einsum("ek,...k->...e", ew, first_win,
                          precision=precision) * lead_sign
        last_win = x_local[..., -ws:]
        trail = jnp.einsum("ek,...k->...e", ew, last_win,
                           precision=precision)[..., ::-1]
        head_mask = (jnp.arange(nloc) < n)
        tail_mask = (jnp.arange(nloc) >= nloc - n)
        lead_full = jnp.zeros_like(y).at[..., :n].set(lead)
        trail_full = jnp.zeros_like(y).at[..., -n:].set(trail)
        y = jnp.where(jnp.logical_and(is_first, head_mask), lead_full, y)
        y = jnp.where(jnp.logical_and(is_last, tail_mask), trail_full, y)

    return y * jnp.asarray(dt_inv, dtype=y.dtype)


def apply_sharded(
    x: jax.Array,
    center_w: jax.Array,
    edge_w: Optional[jax.Array] = None,
    *,
    half_window: int,
    mesh: Mesh,
    boundary: BoundaryMode = BoundaryMode.POLYNOMIAL,
    dt_inv: float | jax.Array = 1.0,
    derivative: int = 0,
    reference_edge_sign: bool = False,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "batch",
    precision=lax.Precision.HIGHEST,
    method: str = "auto",
    halo: str = "ppermute",
) -> jax.Array:
    """Same-length filter of ``x`` (shape ``(..., N)`` or ``(N,)``) sharded
    along the sample axis over ``mesh[seq_axis]`` (and optionally along the
    leading axis over ``mesh[batch_axis]``).

    Semantics identical to :func:`savgol_tpu.ops.apply.savgol_apply`;
    communication is two neighbor sends of ``half_window`` samples per
    shard. ``method="auto"`` (default) runs each shard's local correlation
    on the fast single-chip path (Pallas/MXU on TPU). ``halo`` selects the
    exchange implementation: ``"ppermute"`` (default, XLA collectives) or
    ``"rdma"`` (Pallas ``make_async_remote_copy`` ring — see
    :mod:`savgol_tpu.parallel.ici_halo`); both produce identical results.
    """
    if halo not in ("ppermute", "rdma"):
        raise ValueError(f"halo must be 'ppermute' or 'rdma', got {halo!r}")
    if not isinstance(boundary, BoundaryMode):
        # same string coercion as savgol_apply — the enum identity checks
        # in _local_apply would silently treat a string as CONSTANT
        boundary = BoundaryMode(boundary)
    from savgol_tpu.ops.apply import _resolve_method

    n = int(half_window)
    method = _resolve_method(method, 2 * n + 1)
    if method not in ("xla", "pallas", "mxu", "bf16"):
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'mxu' or 'bf16', "
            f"got {method!r}")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    if x.shape[-1] % mesh.shape[seq_axis] != 0:
        raise ValueError(
            f"sample axis ({x.shape[-1]}) must divide evenly over "
            f"{mesh.shape[seq_axis]} sequence shards")
    lead_sign = 1.0
    if not reference_edge_sign and (int(derivative) % 2 == 1):
        lead_sign = -1.0

    use_batch = (batch_axis is not None and batch_axis in mesh.shape
                 and x.shape[0] % mesh.shape[batch_axis] == 0
                 and x.shape[0] >= mesh.shape[batch_axis])
    bspec = batch_axis if use_batch else None
    spec = P(*([bspec] + [None] * (x.ndim - 2) + [seq_axis]))

    fn = functools.partial(
        _local_apply, center_w=center_w, edge_w=edge_w, n=n,
        boundary=boundary, dt_inv=dt_inv, lead_sign=lead_sign,
        axis_name=seq_axis, precision=precision, method=method, halo=halo)
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False)
    y = mapped(x)
    return y[0] if squeeze else y
