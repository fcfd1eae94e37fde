"""Tile-geometry sweep for the stacked rowmxu kernel vs K single-stencil
kernel launches (raw valid kernels, pre-padded input, chained
k-difference). Decides whether the stacked form's ~15% API-level loss
(probe_stack.py) is VMEM/tile geometry or inherent.

Run ON TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/probe_stack_tiles.py
"""

from __future__ import annotations

import functools
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply2d import _stencil_stack

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _chain(fn, x, *, iters=8, k=16):
    # k=16: sub-ms steps are swamped by host/tunnel jitter at k=2 (this
    # probe's original k=2 run claimed a 37% 128x1024 win that k=16
    # single-stencil runs (probe_tiles_exact.py) did not reproduce).
    return bench_chain(fn, x, iters=iters, k=k, feedback_scale=1e-2)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", choices=("highest", "bf16"), default="highest")
    args = ap.parse_args()

    ws = 13
    hw = (ws - 1) // 2
    W, _ = _stencil_stack(hw, hw, 3, [(2, 0), (1, 1), (0, 2)], 1.0, 1.0)
    dtype = jnp.float32 if args.prec == "highest" else jnp.bfloat16
    Wj = jnp.asarray(W, dtype=dtype)
    K = W.shape[0]

    rng = np.random.default_rng(0)
    # pre-padded so both kernels see identical valid geometry; the chain
    # needs same-size in/out, so crop back after each step
    R = C = 2048
    img = jnp.asarray(rng.standard_normal((R + ws - 1, C + ws - 1)),
                      dtype=dtype)
    npix = R * C
    hp = (jax.lax.Precision.HIGHEST if args.prec == "highest"
          else jax.lax.Precision.DEFAULT)

    def crop_pad(y):
        # (R, C) valid output -> same-size chain input via zero pad
        return jnp.pad(y, ((hw, hw), (hw, hw)))

    def single_k(v, rows, cols):
        acc = None
        for kk in range(K):
            y = pc.correlate2d_valid_pallas_rowmxu(
                v, Wj[kk], rows=rows, cols=cols, mxu_precision=hp)
            acc = y if acc is None else acc + y
        return crop_pad(acc)

    def stacked(v, rows, cols):
        y = pc.correlate2d_valid_pallas_rowmxu_stack(
            v, Wj, rows=rows, cols=cols, mxu_precision=hp)
        return crop_pad(y.sum(axis=0))

    for rows, cols in ((256, 512), (128, 1024)):
        for rep in range(3):
            t_s = _chain(functools.partial(stacked, rows=rows, cols=cols),
                         img)
            t_p = _chain(functools.partial(single_k, rows=rows, cols=cols),
                         img)
            print(f"rows={rows:3d} cols={cols:4d}  "
                  f"stacked {npix / t_s / 1e9:5.2f} Gpix/s  "
                  f"Kx single {npix / t_p / 1e9:5.2f} Gpix/s  "
                  f"ratio {t_p / t_s:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
