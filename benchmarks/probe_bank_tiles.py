"""Probe: bank-MXU kernel tile geometry on the sweep's folded shape.

The 131k single-sequence sweep folds to a (64, 2176) slab; with the
default (rows=128 -> 64, cols=2048) tile that is ONE grid step — no
input/output pipelining, measured ~15% effective MXU. This probe sweeps
(rows, cols) on the raw bank kernel (K=6, ws=65, traced weights) to find
the marginal-rate sweet spot, and re-measures the full sweep with the
winner plumbed through.

Run ON TPU:  python benchmarks/probe_bank_tiles.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from savgol_tpu.ops import pallas_conv as pc
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainlib import bench_chain

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    N = 131_072
    K, ws = 6, 65
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, ws)), dtype=np.float32)

    def run(name, fn, x, nsamp, k=8):
        t0 = time.perf_counter()
        fc = jax.jit(fn)
        jax.block_until_ready(fc(x))
        comp = time.perf_counter() - t0
        per_step, ratio, _ = bench_chain(fn, x, iters=3, k=k,
                                         return_info=True)
        rate = nsamp / per_step / 1e9
        print(f"{name:26s} chained {rate:8.3f} Gs/s-agg ({rate/K:6.3f}/cfg)"
              f"  ratio {ratio:.2f}  [compile {comp:.0f}s]", flush=True)

    def chainable(y, v):
        # valid output is ws-1 shorter than the input; pad for feedback
        return jnp.pad(y.sum(axis=0), (0, ws - 1)) * 1e-3 + v

    for rows in (8, 16, 32, 64):
        for cols in (256, 512, 1024, 2048):
            def fn(v, r=rows, c=cols):
                return chainable(
                    pc.correlate_valid_bank_pallas_mxu(v, w, rows=r,
                                                       cols=c), v)
            try:
                run(f"bank r{rows} c{cols}", fn, x, K * N)
            except Exception as e:  # noqa: BLE001
                print(f"bank r{rows} c{cols} FAILED: "
                      f"{type(e).__name__}: {e}"[:150], flush=True)

    # VPU bank for reference at its default tile
    run("bank vpu default",
        lambda v: chainable(pc.correlate_valid_bank_pallas(v, w), v),
        x, K * N)


if __name__ == "__main__":
    main()
