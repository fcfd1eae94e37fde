"""2D filter object: precomputed stencil + jitted apply."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from savgol_tpu.config import Boundary2D, Savgol2DConfig
from savgol_tpu.ops.apply2d import savgol2d_apply
from savgol_tpu.ops.weights import savgol2d_weights_np

__all__ = ["Savgol2D"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Savgol2D:
    """True-2D polynomial least-squares filter.

    Equivalent of ``Savgol2DFilter``
    (/root/reference/include/iterative/savgol2d.h:95-103): the (H, W)
    convolution stencil is one row of pinv(design matrix), precomputed in
    f64 and resident on device. Rectangular windows supported
    (half_window_x != half_window_y).
    """

    config: Savgol2DConfig = dataclasses.field(metadata=dict(static=True))
    weights: jax.Array
    scale: jax.Array

    @classmethod
    def create(cls, config: Savgol2DConfig, dtype=jnp.float32) -> "Savgol2D":
        """Equivalent of ``savgol2d_create`` (src/savgol2d.c:304-342)."""
        w = savgol2d_weights_np(config, dtype=np.float64)
        return cls(
            config=config,
            weights=jnp.asarray(w, dtype=dtype),
            scale=jnp.asarray(config.scale, dtype=dtype),
        )

    def valid_size(self, rows: int, cols: int):
        """Output dims for VALID mode (savgol2d.h:250-256)."""
        return (rows - 2 * self.config.half_window_y,
                cols - 2 * self.config.half_window_x)

    def apply(self, x: jax.Array, *,
              boundary: Boundary2D = Boundary2D.CONSTANT,
              use_pallas: bool = False,
              method: str = "auto") -> jax.Array:
        """Filter the last two axes of ``x``
        (ref: savgol2d_apply, src/savgol2d.c:398-456)."""
        return savgol2d_apply(x, self.weights, boundary=boundary,
                              scale=self.scale, use_pallas=use_pallas,
                              method=method)

    def apply_valid(self, x: jax.Array, *,
                    use_pallas: bool = False,
                    method: str = "auto") -> jax.Array:
        """VALID-mode 2D filter (ref: savgol2d_apply_valid,
        src/savgol2d.c:356-396)."""
        return savgol2d_apply(x, self.weights, boundary=Boundary2D.VALID,
                              scale=self.scale, use_pallas=use_pallas,
                              method=method)

    def __call__(self, x: jax.Array, **kw) -> jax.Array:
        return self.apply(x, **kw)
