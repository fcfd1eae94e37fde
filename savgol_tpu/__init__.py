"""savgol_tpu — TPU-native Savitzky-Golay filtering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the C
reference library Tugbars/Savitzky-Golay-Filter (see SURVEY.md): batch 1D
smoothing/differentiation with four boundary modes, VALID output, ND
``axis=`` batching, fixed-latency online streaming, true-2D polynomial
least-squares filtering (gradient / Hessian / Laplacian, rectangular
windows), coefficient export, and multi-chip sharded execution via
``shard_map`` halo exchange.

Quick start::

    import jax.numpy as jnp
    import savgol_tpu as sg

    f = sg.Savgol1D.create(sg.SavgolConfig(half_window=12, poly_order=4))
    y = f.apply(x)                          # same-shape smoothed output
    dy = sg.Savgol1D.create(sg.deriv1(12, 4, dt=0.01)).apply(x)
"""

from savgol_tpu.config import (
    Boundary2D,
    BoundaryMode,
    MAX_DERIVATIVE,
    MAX_HALF_WINDOW,
    MAX_POLY_ORDER,
    Savgol2DConfig,
    SavgolConfig,
    deriv1,
    deriv2,
    num_terms_2d,
    smooth,
)
from savgol_tpu.models import (Savgol1D, Savgol2D, SavgolBank,
                               SavgolStream)
from savgol_tpu.ops.apply import (
    savgol_apply,
    savgol_apply_valid,
)
from savgol_tpu.ops.masked import savgol_apply_masked, savgol2d_apply_masked
from savgol_tpu.ops.nonuniform import (savgol_apply_nonuniform,
                                       savgol_resample)
from savgol_tpu.ops.apply2d import (
    savgol2d_apply,
    savgol2d_gradient,
    savgol2d_hessian,
    savgol2d_laplacian,
)
from savgol_tpu.ops.weights import (
    savgol2d_weights,
    savgol2d_weights_np,
    savgol_weights,
    savgol_weights_np,
)
from savgol_tpu.scipy_compat import savgol_coeffs, savgol_filter
from savgol_tpu.stream import (
    ChunkState,
    StreamState,
    chunk_init,
    stream_apply,
    stream_flush,
    stream_flush_chunked,
    stream_flush_leading,
    stream_init,
    stream_process_chunk,
    stream_push,
    stream_push_full,
    stream_reset,
)

__version__ = "0.3.0"

__all__ = [
    "BoundaryMode", "Boundary2D", "SavgolConfig", "Savgol2DConfig",
    "MAX_HALF_WINDOW", "MAX_POLY_ORDER", "MAX_DERIVATIVE",
    "smooth", "deriv1", "deriv2", "num_terms_2d",
    "Savgol1D", "Savgol2D", "SavgolStream", "SavgolBank",
    "savgol_weights", "savgol_weights_np",
    "savgol2d_weights", "savgol2d_weights_np",
    "savgol_apply", "savgol_apply_valid", "savgol_apply_masked",
    "savgol_apply_nonuniform", "savgol_resample",
    "savgol_filter", "savgol_coeffs",
    "savgol2d_apply", "savgol2d_apply_masked", "savgol2d_gradient", "savgol2d_hessian",
    "savgol2d_laplacian",
    "StreamState", "stream_init", "stream_reset", "stream_push",
    "stream_push_full", "stream_flush", "stream_flush_leading",
    "stream_apply", "ChunkState", "chunk_init", "stream_process_chunk",
    "stream_flush_chunked",
]
