"""2D bf16 API wrapper cost: kernel-emitted f32 output vs bf16 output +
separate up-cast pass.

The chained attribution (ROADMAP round-3) put the rowmxu kernel at ~22.4
Gpix/s on-device but the API same-size bf16 path at ~13.7: the wrapper
cost is the fused pad, the casts, and (fixed earlier) the scale multiply.
The output-side cast is a full read+write of the image; `out_dtype=f32`
makes the kernel store its f32 accumulator directly (4 B/pix stores
instead of 2, but no second pass). This probe measures both forms in one
process with the chained k-difference protocol.

Run ON TPU:  python benchmarks/probe_outdtype.py [--iters 5]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.config import Savgol2DConfig
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.weights import savgol2d_weights_np

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _bench_chain(fn, x, *, iters: int, k: int = 2):
    per_step, ratio, _ = bench_chain(
        fn, x, iters=iters, k=k, feedback_scale=1e-2, return_info=True)
    flag = "" if 1.6 <= ratio <= 2.6 else f"  !! k-ratio {ratio:.2f}"
    return per_step, flag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "probe is a hardware measurement"

    rng = np.random.default_rng(0)
    B, R, C = args.batch, args.dim, args.dim
    img = jnp.asarray(rng.standard_normal((B, R, C)), dtype=jnp.float32)
    npix = B * R * C
    w_np = savgol2d_weights_np(Savgol2DConfig(5, 5, 3), dtype=np.float64)
    w32 = jnp.asarray(w_np, dtype=jnp.float32)

    def cast_out(v):
        y = pc.savgol2d_same_pallas_rowmxu(
            v.astype(jnp.bfloat16), w32, "edge",
            mxu_precision=jax.lax.Precision.DEFAULT)
        return y.astype(v.dtype)

    def f32_out(v):
        return pc.savgol2d_same_pallas_rowmxu(
            v.astype(jnp.bfloat16), w32, "edge",
            mxu_precision=jax.lax.Precision.DEFAULT,
            out_dtype=jnp.float32)

    ya = np.asarray(cast_out(img[:1]), dtype=np.float64)
    yb = np.asarray(f32_out(img[:1]), dtype=np.float64)
    # f32_out keeps MORE precision (no down-cast), so only a loose match
    err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-30)

    for label, fn in (("bf16-out + cast pass", cast_out),
                      ("f32-out direct     ", f32_out)):
        t, flag = _bench_chain(fn, img, iters=args.iters)
        print(f"{label}:  {npix / t / 1e9:6.2f} Gpix/s{flag}")
    print(f"cross-form rel diff {err:.2e} (expected ~bf16 rounding, <1e-2)")


if __name__ == "__main__":
    main()
