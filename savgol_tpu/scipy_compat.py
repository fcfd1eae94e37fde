"""Drop-in scipy.signal compatibility layer.

``savgol_filter`` / ``savgol_coeffs`` with scipy's exact signatures and mode
names, computed by this framework (jit/vmap/shard-able, Pallas fast path,
weights exact where scipy's lstsq loses precision). Lets scipy users switch
with an import swap::

    from savgol_tpu.scipy_compat import savgol_filter   # was scipy.signal

Mode mapping (scipy name -> implementation):

  * ``interp``   -> POLYNOMIAL edge fit (the reference's default)
  * ``wrap``     -> PERIODIC
  * ``nearest``  -> CONSTANT (edge replication)
  * ``mirror``   -> reflect WITHOUT edge duplication (np.pad 'reflect') —
                    an EXTENSION beyond the reference, whose REFLECT
                    duplicates the edge sample
  * ``constant`` -> pad with ``cval`` — also an extension
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from savgol_tpu.config import BoundaryMode, SavgolConfig
from savgol_tpu.ops.apply import (_ensure_float, _move_axis_last,
                                  _resolve_method, _restore_axis,
                                  correlate_valid, correlate_valid_mxu,
                                  savgol_apply_core)
from savgol_tpu.ops.weights import (_gram_table, _norm_factors,
                                    _weights_from_table, savgol_weights_np)

__all__ = ["savgol_coeffs", "savgol_filter"]


def _compat_weights_np(n: int, polyorder: int, deriv: int):
    """(center, edge) f64 weights for ANY 0 <= deriv <= polyorder.

    The reference caps half_window at 32, poly_order at 10 and
    derivatives at 4 (src/savgolFilter.c:639-677) and ``SavgolConfig``
    keeps those caps for reference parity — but scipy allows any
    ``polyorder < window_length`` and ``deriv <= polyorder``, and the
    vectorized Gram recurrence (ops/weights.py::_gram_table) holds for
    arbitrary (n, m, d). The compat layer therefore computes weights
    directly whenever the request falls outside the reference envelope,
    keeping the validated config path inside it.
    """
    if polyorder >= 2 * n + 1:
        # scipy's own constraint (raised before any branch so the direct
        # path can't dodge it into a 0/0 in the recurrence)
        raise ValueError("polyorder must be less than window_length")
    if deriv <= 4 and n <= 32 and polyorder <= 10:
        cfg = SavgolConfig(n, polyorder, deriv)
        return savgol_weights_np(cfg, dtype=np.float64)
    pts = np.arange(-n, n + 1, dtype=np.float64)
    G = _gram_table(pts, n, polyorder, deriv, np)
    factors = _norm_factors(n, polyorder)
    return _weights_from_table(G, factors, n, deriv, np)

_NATIVE_MODES = {
    "interp": BoundaryMode.POLYNOMIAL,
    "wrap": BoundaryMode.PERIODIC,
    "nearest": BoundaryMode.CONSTANT,
}


def savgol_coeffs(window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, pos=None, use: str = "conv"):
    """scipy.signal.savgol_coeffs equivalent (f64, Gram recurrence).

    More accurate than scipy's lstsq construction at extreme configs
    (verified against exact rational arithmetic at n=32, m=10, d=4 where
    scipy is off by up to 6e-2).
    """
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")
    n = window_length // 2
    if deriv > polyorder:
        # scipy semantics: the fitted polynomial's higher derivatives vanish
        return np.zeros(window_length, dtype=np.float64)
    center, edge = _compat_weights_np(n, polyorder, deriv)
    if pos is None or pos == n:
        w = center
    elif float(pos) == int(pos) and 0 <= int(pos) < window_length:
        # integer positions map to the reference's precomputed edge rows
        # (pos > n directly; pos < n by mirror symmetry)
        pos = int(pos)
        if pos > n:
            w = edge[2 * n - pos]
        else:
            w = edge[pos][::-1] * ((-1.0) ** deriv)
    else:
        # fractional pos: evaluate the Gram fit at the arbitrary target
        # t = pos - n (the three-term recurrence holds at non-integer
        # points), matching scipy's float-pos semantics
        if not 0 <= float(pos) < window_length:
            raise ValueError("pos must be within the window")
        t = np.asarray([float(pos) - n], dtype=np.float64)
        pts = np.arange(-n, n + 1, dtype=np.float64)
        G = _gram_table(pts, n, polyorder, deriv, np)
        Gt = _gram_table(t, n, polyorder, deriv, np)
        factors = _norm_factors(n, polyorder)
        w = np.einsum("k,ki->i", factors * Gt[:, deriv, 0], G[:, 0, :])
    w = w / (delta ** deriv)
    if use == "conv":
        return w[::-1]
    if use == "dot":
        return w
    raise ValueError("use must be 'conv' or 'dot'")


def savgol_filter(x, window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, axis: int = -1, mode: str = "interp",
                  cval: float = 0.0, *, use_pallas: bool = False,
                  method: str = "auto") -> jax.Array:
    """scipy.signal.savgol_filter equivalent on the savgol_tpu stack."""
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")
    n = window_length // 2
    x = jnp.asarray(x)
    if deriv > polyorder:
        # scipy semantics: output is identically zero
        out_dtype = (x.dtype if jnp.issubdtype(x.dtype, jnp.inexact)
                     else jnp.float32)
        return jnp.zeros(x.shape, dtype=out_dtype)
    center, edge = _compat_weights_np(n, polyorder, deriv)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.inexact) else jnp.float32
    cw = jnp.asarray(center, dtype=dtype)
    ew = jnp.asarray(edge, dtype=dtype)
    dt_inv = 1.0 / (float(delta) ** deriv)

    if mode in _NATIVE_MODES:
        xl, moved = _move_axis_last(x, axis)
        y = savgol_apply_core(
            xl, cw, ew, n, _NATIVE_MODES[mode], dt_inv, derivative=deriv,
            use_pallas=use_pallas, method=method)
        return _restore_axis(y, moved)

    if mode not in ("mirror", "constant"):
        raise ValueError(
            f"mode must be one of interp/mirror/nearest/wrap/constant, "
            f"got {mode!r}")

    # Extension modes: pad explicitly, then valid-correlate.
    xl, moved = _move_axis_last(x, axis)
    xl = _ensure_float(xl, cw)
    if xl.shape[-1] < window_length:
        raise ValueError(
            f"data length ({xl.shape[-1]}) must be >= window_length")
    m = "pallas" if use_pallas else method
    m = _resolve_method(m, window_length)
    if m not in ("xla", "pallas", "mxu", "bf16"):
        raise ValueError(
            f"method must be 'auto', 'xla', 'pallas', 'mxu' or 'bf16', "
            f"got {m!r}")

    def ext_apply(xv):
        pad = [(0, 0)] * (xv.ndim - 1) + [(n, n)]
        if mode == "mirror":
            xp = jnp.pad(xv, pad, mode="reflect")
        else:
            xp = jnp.pad(xv, pad, mode="constant",
                         constant_values=jnp.asarray(cval, dtype=xv.dtype))
        if m == "pallas":
            from savgol_tpu.ops.apply import _pallas_corr_diff
            y = _pallas_corr_diff()(xp, cw)
        elif m == "bf16":
            from savgol_tpu.ops.apply import _pallas_corr_diff
            y = _pallas_corr_diff("bf16")(xp, cw)
        elif m == "mxu":
            y = correlate_valid_mxu(xp, cw)
        else:
            y = correlate_valid(xp, cw)
        return y * jnp.asarray(dt_inv, dtype=xv.dtype)

    if jnp.issubdtype(xl.dtype, jnp.complexfloating):
        # real-linear split, as on the native-mode branch
        from savgol_tpu.ops.apply import _complex_split
        return _restore_axis(_complex_split(ext_apply, xl), moved)
    from savgol_tpu.ops.apply import _compute_dtype
    xl, restore = _compute_dtype(xl)
    y = ext_apply(xl)
    if restore is not None:
        y = y.astype(restore)
    return _restore_axis(y, moved)
