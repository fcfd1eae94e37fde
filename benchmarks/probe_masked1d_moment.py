"""Chained probe: fused masked-1D kernel, moment form vs its roofline.

Measures the production ``savgol_apply_masked`` path (fused Pallas
kernel on TPU) on the bench config (64 x 131072, 20% NaN holes, n=12
m=4) with the chained k-difference protocol, and prints the utilization
against ``speed_of_light_masked_1d`` (which models the moment form:
(2m+1) + (m+1) + 1 HIGHEST K=256 matmuls per output).

Run on hardware: ``python benchmarks/probe_masked1d_moment.py``.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.chainlib import bench_chain
from savgol_tpu.ops.masked import savgol_apply_masked
from savgol_tpu.utils.roofline import speed_of_light_masked_1d


def main():
    B, N = 64, 131_072
    rng = np.random.default_rng(6)
    x_np = rng.standard_normal((B, N)).astype(np.float32)
    x_np[rng.random(x_np.shape) < 0.2] = np.nan
    x = jnp.asarray(x_np)
    mask = jnp.asarray(np.isfinite(x_np))

    def step(v):
        return savgol_apply_masked(v, half_window=12, poly_order=4,
                                   mask=mask, fill=0.0)

    secs, ratio, _ = bench_chain(step, x, k=8, return_info=True)
    gsps = B * N / secs / 1e9
    rl = speed_of_light_masked_1d(4, shape=(B, N))
    print(f"masked1d fused (moment form): {gsps:.3f} Gs/s chained "
          f"(ratio {ratio:.2f}) = "
          f"{100 * gsps * 1e9 / rl.ceiling_per_s:.1f}% of the "
          f"{rl.ceiling_per_s / 1e9:.2f} Gs/s {rl.bound} roofline")


if __name__ == "__main__":
    main()
