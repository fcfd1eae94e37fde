"""Filter banks: several Savitzky-Golay filters over one window, one pass.

The reference computes each derivative with a separate create/apply cycle
(and its 2D code literally creates and destroys a filter per derivative,
src/savgol2d.c:462-618). On TPU the idiomatic form is a BANK: stack the
stencils of all requested filters (same half_window) and evaluate them in a
single vmapped pass over the shared input — smooth + velocity +
acceleration costs one data read instead of three.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from savgol_tpu.config import PAD_MODE, BoundaryMode, SavgolConfig
from savgol_tpu.ops.apply import savgol_apply_core
from savgol_tpu.ops.weights import savgol_weights_np

__all__ = ["SavgolBank"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SavgolBank:
    """K filters sharing a window, applied in one pass.

    All configs must share ``half_window`` and ``boundary``; ``poly_order``,
    ``derivative`` and ``time_step`` may differ per filter.
    """

    configs: Tuple[SavgolConfig, ...] = dataclasses.field(
        metadata=dict(static=True))
    center_weights: jax.Array     # (K, 2n+1)
    edge_weights: jax.Array       # (K, n, 2n+1)
    dt_inv: jax.Array             # (K,)
    lead_signs: jax.Array         # (K,) — odd-derivative edge correction

    @classmethod
    def create(cls, configs: Sequence[SavgolConfig],
               dtype=jnp.float32) -> "SavgolBank":
        configs = tuple(configs)
        if not configs:
            raise ValueError("bank needs at least one config")
        n = configs[0].half_window
        b = configs[0].boundary
        for c in configs[1:]:
            if c.half_window != n or c.boundary != b:
                raise ValueError(
                    "all bank configs must share half_window and boundary")
        cws, ews, dts, signs = [], [], [], []
        for c in configs:
            cw, ew = savgol_weights_np(c, dtype=np.float64)
            cws.append(cw)
            ews.append(ew)
            dt = c.dt_scale
            dts.append(1.0 / dt if dt != 0.0 else 1.0)
            signs.append(-1.0 if c.derivative % 2 else 1.0)
        return cls(
            configs=configs,
            center_weights=jnp.asarray(np.stack(cws), dtype=dtype),
            edge_weights=jnp.asarray(np.stack(ews), dtype=dtype),
            dt_inv=jnp.asarray(dts, dtype=dtype),
            lead_signs=jnp.asarray(signs, dtype=dtype),
        )

    @classmethod
    def smooth_and_derivatives(cls, half_window: int, poly_order: int,
                               max_derivative: int = 2, time_step: float = 1.0,
                               dtype=jnp.float32) -> "SavgolBank":
        """Convenience: [smooth, d1, ..., d_max] over one window."""
        cfgs = [SavgolConfig(half_window, poly_order, d, time_step)
                for d in range(max_derivative + 1)]
        return cls.create(cfgs, dtype=dtype)

    @property
    def half_window(self) -> int:
        return self.configs[0].half_window

    def apply(self, x: jax.Array, *, axis: int = -1,
              reference_edge_sign: bool = False,
              use_pallas: bool = False,
              method: str = "auto") -> jax.Array:
        """Apply all K filters; output shape (K,) + x.shape.

        ``method="auto"`` (default) routes the shared center pass through
        the K-stencil bank kernel on TPU — ONE input read for all K
        filters; ``"xla"`` forces the vmapped conv path, ``"pallas"`` (or
        ``use_pallas=True``) forces the bank kernel."""
        if use_pallas:
            method = "pallas"
        if method == "auto":
            method = ("pallas" if jax.default_backend() == "tpu"
                      else "xla")
        if method not in ("xla", "pallas"):
            raise ValueError(
                f"method must be 'auto', 'xla' or 'pallas', got {method!r}")
        n = self.half_window
        boundary = self.configs[0].boundary
        moved = axis % x.ndim != x.ndim - 1
        if moved:
            x = jnp.moveaxis(x, axis, -1)

        if method == "pallas":
            out = self._apply_bank_pallas(x, reference_edge_sign)
            if moved:
                target = axis + 1 if axis >= 0 else axis
                out = jnp.moveaxis(out, -1, target)
            return out

        def one(cw, ew, dt, sign):
            # fold the per-filter leading-edge sign into the edge matrix the
            # core sees for its LEAD use; the core's own correction is
            # disabled (reference_edge_sign=True) and applied here instead.
            y = savgol_apply_core(
                x, cw, ew, n, boundary, dt,
                derivative=0, reference_edge_sign=True, method="xla")
            if boundary is BoundaryMode.POLYNOMIAL:
                s = jnp.where(reference_edge_sign, 1.0, sign).astype(y.dtype)
                head = y[..., :n] * s
                y = jnp.concatenate([head, y[..., n:]], axis=-1)
            return y

        out = jax.vmap(one)(self.center_weights, self.edge_weights,
                            self.dt_inv, self.lead_signs)
        if moved:
            # out has a leading K axis, so positive source positions shift
            # by one; negative positions still index from the end.
            target = axis + 1 if axis >= 0 else axis
            out = jnp.moveaxis(out, -1, target)
        return out

    def _apply_bank_pallas(self, x: jax.Array,
                           reference_edge_sign: bool) -> jax.Array:
        """Shared-input-pass bank: Pallas K-stencil center kernel + XLA
        edge fixups (POLYNOMIAL) or pad modes."""
        from savgol_tpu.ops import pallas_conv as pc

        n = self.half_window
        ws = 2 * n + 1
        N = x.shape[-1]
        boundary = self.configs[0].boundary
        x = x.astype(self.center_weights.dtype) if not jnp.issubdtype(
            x.dtype, jnp.inexact) else x
        # half inputs compute in f32 (the VPU bank kernel would otherwise
        # accumulate in bf16, ~1e-2); restored on output below
        from savgol_tpu.ops.apply import _compute_dtype
        x, restore = _compute_dtype(x)
        wdt = self.center_weights * self.dt_inv[:, None]   # fold dt

        B = 1
        for s in x.shape[:-1]:
            B *= s

        def bank_corr(xin):
            # wide batches: K stationary band matmuls share one input
            # pass on the MXU (measured 1.7x the VPU bank on v5e)
            if (jax.default_backend() == "tpu"
                    and B >= pc._BANK_MXU_MIN_BATCH):
                return pc.correlate_valid_bank_pallas_mxu(xin, wdt)
            return pc.correlate_valid_bank_pallas(xin, wdt)

        if boundary is not BoundaryMode.POLYNOMIAL:
            mode = PAD_MODE[boundary]
            pad = [(0, 0)] * (x.ndim - 1) + [(n, n)]
            xp = jnp.pad(x, pad, mode=mode)
            y = bank_corr(xp)
            return y.astype(restore) if restore is not None else y

        center = bank_corr(x)                              # (K, ..., N-2n)
        ew = self.edge_weights.astype(x.dtype)             # (K, n, ws)
        signs = jnp.where(reference_edge_sign, 1.0,
                          self.lead_signs).astype(x.dtype)
        scale = (self.dt_inv * signs)[:, None]
        hp = jax.lax.Precision.HIGHEST
        lead = jnp.einsum("kew,...w->k...e", ew,
                          x[..., :ws][..., ::-1],
                          precision=hp) * scale.reshape(
            (ew.shape[0],) + (1,) * (x.ndim - 1) + (1,))
        trail = jnp.einsum("kew,...w->k...e", ew, x[..., N - ws:],
                           precision=hp)
        trail = (trail * self.dt_inv.reshape(
            (ew.shape[0],) + (1,) * (x.ndim - 1) + (1,)))[..., ::-1]
        y = jnp.concatenate([lead, center, trail], axis=-1)
        return y.astype(restore) if restore is not None else y

    def __call__(self, x: jax.Array, **kw) -> jax.Array:
        return self.apply(x, **kw)
