"""Stacked-vs-per-stencil 2D derivative probe: does feeding all K
stencils through ONE rowmxu pass (one input read) beat K separate
rowmxu launches?

Context: savgol2d_gradient/hessian/laplacian build a (K, H, W) stencil
stack (ref: src/savgol2d.c:462-618 runs create/apply/destroy per
derivative). In the >=11-tap band the exact path runs the row-banded MXU
kernel at HIGHEST; the stacked kernel reuses each input slab for all K
band pairs, so HBM input traffic drops ~Kx while MXU work is unchanged.
This probe measures hessian-shaped stacks (K=3) through the API geometry
(same-size CONSTANT pad) with the chained k-difference protocol.

Run ON TPU:  python benchmarks/probe_stack.py [--iters 5] [--sizes 13,17,25]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax.numpy as jnp

from savgol_tpu.ops.apply2d import (Boundary2D, _pad2d, _stencil_stack,
                                    savgol2d_apply_stack)

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _bench_chain(fn, x, *, iters: int, k: int = 2):
    """Chained k-difference timing (benchmarks/chainlib.py); fn maps an
    image to an image."""
    return bench_chain(fn, x, iters=iters, k=k, feedback_scale=1e-2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sizes", default="13,17,25")
    ap.add_argument("--img", type=int, default=2048)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((args.img, args.img)),
                      dtype=jnp.float32)
    npix = args.img * args.img

    for ws in (int(s) for s in args.sizes.split(",")):
        hw = (ws - 1) // 2
        W, s = _stencil_stack(hw, hw, 3, [(2, 0), (1, 1), (0, 2)], 1.0, 1.0)
        Wj = jnp.asarray(W, dtype=jnp.float32)
        sj = jnp.asarray(s, dtype=jnp.float32)
        K = W.shape[0]

        def stacked(v):
            y = savgol2d_apply_stack(v, Wj, boundary=Boundary2D.CONSTANT,
                                     scales=sj, method="pallas")
            return y.sum(axis=-3)        # collapse K for the chain

        def per_stencil(v):
            from savgol_tpu.ops.apply2d import _pallas_rowmxu_exact_diff
            ny = nx = hw
            vp = _pad2d(v, ny, nx, Boundary2D.CONSTANT)
            op = _pallas_rowmxu_exact_diff()
            acc = None
            for kk in range(K):
                y = op(vp, Wj[kk]) * sj[kk]
                acc = y if acc is None else acc + y
            return acc

        # correctness gate first (small crop)
        small = img[:256, :256]
        ga, gb = np.asarray(stacked(small)), np.asarray(per_stencil(small))
        err = np.abs(ga - gb).max() / max(1.0, np.abs(gb).max())
        assert err < 1e-5, err

        t_stack = _bench_chain(stacked, img, iters=args.iters)
        t_per = _bench_chain(per_stencil, img, iters=args.iters)
        print(f"ws={ws:2d} K={K}  stacked {npix / t_stack / 1e9:6.2f} Gpix/s"
              f"  per-stencil {npix / t_per / 1e9:6.2f} Gpix/s"
              f"  speedup {t_per / t_stack:4.2f}x  (rel err {err:.1e})")


if __name__ == "__main__":
    main()
