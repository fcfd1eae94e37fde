"""Probe: fused masked-2D kernel vs the staged stack-MXU pipeline (v5e).

Bench config (VERDICT r04 #2): 1024x1024, 11x11 window, order 3, 20%
holes. Staged r4 record: ~70 Mpix/s chained; target >= 100.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from chainlib import bench_chain

from savgol_tpu.ops.masked import savgol2d_apply_masked, _masked2d_fused_diff


def main():
    rng = np.random.default_rng(0)
    im_np = rng.standard_normal((1024, 1024)).astype(np.float32)
    im_np[rng.random(im_np.shape) < 0.2] = np.nan
    imj = jnp.asarray(im_np)
    print("device:", jax.devices()[0], flush=True)

    kw = dict(half_window_x=5, half_window_y=5, poly_order=3, fill=0.0)

    # parity on-device first (small crop): fused default vs xla staged
    t0 = time.time()
    yf = np.asarray(jax.jit(lambda v: savgol2d_apply_masked(v, **kw))(
        imj[:256, :256]))
    print(f"fused compile+run {time.time() - t0:.1f}s", flush=True)
    yx = np.asarray(jax.jit(lambda v: savgol2d_apply_masked(
        v, method="xla", **kw))(imj[:256, :256]))
    mask = np.isfinite(im_np[:256, :256])
    from scipy.ndimage import uniform_filter
    cov = uniform_filter(mask.astype(float), size=11, mode="constant") * 121
    well = cov >= 0.7 * 121
    print("fused vs xla (well-covered):", np.abs(yf - yx)[well].max(),
          " (all):", np.abs(yf - yx).max(), flush=True)

    for name, fn in (
        ("fused_default", lambda v: savgol2d_apply_masked(v, **kw)),
        ("staged_stackmxu", lambda v: _staged(v, **kw)),
    ):
        per, ratio, _ = bench_chain(fn, imj, iters=5, k=4,
                                    feedback_scale=1e-3, return_info=True)
        print(f"{name}: {imj.size / per / 1e6:8.1f} Mpix/s chained "
              f"(ratio {ratio:.2f})", flush=True)


def _staged(v, **kw):
    # the pre-fusion default: staged stack-MXU gram + plane solve
    from savgol_tpu.ops import masked as mk
    import savgol_tpu.ops.pallas_masked2d as pm

    orig = pm.fused2d_supported
    pm.fused2d_supported = lambda *a: False
    try:
        return savgol2d_apply_masked(v, **kw)
    finally:
        pm.fused2d_supported = orig


if __name__ == "__main__":
    main()
