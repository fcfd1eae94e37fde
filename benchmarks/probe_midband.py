"""Mid-band exact-path dispatch probe: dense const-baked VPU kernel vs
row-banded MXU kernel at HIGHEST precision, measured THROUGH THE API
geometry (same-size, fused boundary pad) at several window sizes.

History (ROADMAP "Round-3 candidates" #5): round 2 measured a direct-call
rowmxu win in the 13-17-wide band that did NOT reproduce through the API,
so the dispatch was reverted (d08d026). Since then the kernel moved the
vertical shift to the input operand (+~40% at bf16) and the timing
protocol moved to chained k-difference, and a first API-level rerun showed
rowmxu@HIGHEST clearly ahead mid-band (13x13: 4.19 vs 2.49 Gpix/s;
17x17: 3.26 vs 1.36). This probe is the decisive sweep: both paths in one
process, chained lax.scan with k-difference, plus an HLO marker assert
that each chain really contains the kernel it claims to measure.

Run ON TPU:  python benchmarks/probe_midband.py [--iters 5] [--sizes 11,13,17,21,25]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.config import Boundary2D, Savgol2DConfig
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply2d import savgol2d_apply
from savgol_tpu.ops.weights import savgol2d_weights_np

try:
    from chainlib import bench_chain           # run as benchmarks/probe_*.py
except ImportError:                            # imported as benchmarks.probe_*
    from benchmarks.chainlib import bench_chain


def _bench_chain_same(fn, x, *, iters: int, k: int = 2):
    """Chained same-size k-difference timing (benchmarks/chainlib.py);
    returns (per_step_seconds, ratio_flag, hlo_text_of_the_k_chain)."""
    per_step, ratio, compiled_k = bench_chain(
        fn, x, iters=iters, k=k, feedback_scale=1e-2, return_info=True)
    flag = "" if 1.6 <= ratio <= 2.6 else f"  !! k-ratio {ratio:.2f}"
    return per_step, flag, compiled_k.as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sizes", default="11,13,17,21,25")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--valid", action="store_true",
                    help="probe VALID mode instead of same-size")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "probe is a hardware measurement"

    rng = np.random.default_rng(0)
    B, R, C = args.batch, args.dim, args.dim
    img = jnp.asarray(rng.standard_normal((B, R, C)), dtype=jnp.float32)
    npix = B * R * C

    for spec in args.sizes.split(","):
        # "13" -> 13x13; "5x17" -> height 5, width 17
        if "x" in spec:
            wsy, wsx = (int(s) for s in spec.split("x"))
        else:
            wsy = wsx = int(spec)
        hwy, hwx = (wsy - 1) // 2, (wsx - 1) // 2
        w_np = savgol2d_weights_np(Savgol2DConfig(hwx, hwy, 3),
                                   dtype=np.float64)
        ws = f"{wsy}x{wsx}"

        if args.valid:
            # VALID shrinks the output, so the chain feed-back re-pads to
            # the input size with zeros (an extra cost both paths share)
            def refit(y, v):
                pad = [(0, 0)] * (y.ndim - 2) + [(hwy, hwy), (hwx, hwx)]
                return jnp.pad(y, pad)

            def api_dense(v):
                y = savgol2d_apply(v, jnp.asarray(w_np, dtype=v.dtype),
                                   boundary=Boundary2D.VALID,
                                   method="pallas")
                return refit(y, v)

            def api_rowmxu(v):
                y = pc.correlate2d_valid_pallas_rowmxu(
                    v, jnp.asarray(w_np, dtype=v.dtype),
                    mxu_precision=jax.lax.Precision.HIGHEST)
                return refit(y, v)
        else:
            def api_dense(v):
                return savgol2d_apply(v, jnp.asarray(w_np, dtype=v.dtype),
                                      boundary=Boundary2D.CONSTANT,
                                      method="pallas")

            def api_rowmxu(v):
                return pc.savgol2d_same_pallas_rowmxu(
                    v, jnp.asarray(w_np, dtype=v.dtype), "edge",
                    mxu_precision=jax.lax.Precision.HIGHEST)

        # correctness cross-check first (also warms one compile each)
        yd = np.asarray(api_dense(img[:1]), dtype=np.float64)
        yr = np.asarray(api_rowmxu(img[:1]), dtype=np.float64)
        scale = np.abs(yd).max()
        err = np.abs(yd - yr).max() / max(scale, 1e-30)

        results = {}
        for label, fn, want_rowmxu in (("dense", api_dense, False),
                                       ("rowmxu", api_rowmxu, True)):
            t, flag, hlo = _bench_chain_same(fn, img, iters=args.iters)
            has = "corr2d_rowmxu" in hlo
            marker = "ok" if has == want_rowmxu else "WRONG-KERNEL"
            results[label] = (npix / t / 1e9, flag, marker)
        d, r = results["dense"], results["rowmxu"]
        print(f"{ws:>6s}  dense {d[0]:6.2f} Gpix/s [{d[2]}]{d[1]}  "
              f"rowmxu@HIGHEST {r[0]:6.2f} Gpix/s [{r[2]}]{r[1]}  "
              f"rel-err {err:.2e}  winner={'rowmxu' if r[0] > d[0] else 'dense'}")


if __name__ == "__main__":
    main()
