"""Probe: sweep center-correlation as ONE bank kernel vs per-config ops.

VERDICT r03 #6: the sweep runs its C center correlations as C separate
banded-MXU einsum launches (0.6-0.9 ms fixed cost each, probe_sweep.py),
capping the 131k bench at ~1.1-1.2 Gs/s/config. The bank kernels
(pallas_conv.correlate_valid_bank_pallas[_mxu]) fold the sample axis once
and run all C stencils against ONE input pass — this probe measures the
full sweep with each center-correlation method at the bench shape.

Run ON TPU:  python benchmarks/probe_sweep_bank.py
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

    from savgol_tpu.ops.sweep import savgol_apply_sweep
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainlib import bench_chain

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    N = 131_072
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    ns = jnp.asarray([4, 8, 12, 16, 24, 32])
    ms = jnp.asarray([2, 3, 4, 4, 5, 6])
    C = int(ns.shape[0])

    ref = None
    for method in ("mxu", "pallas", "mxu_bank", "xla"):
        def fn(v, method=method):
            y = savgol_apply_sweep(v, ns, ms, method=method)
            return y.sum(axis=0) * 1e-3 + v   # same shape for chaining

        try:
            t0 = time.perf_counter()
            fc = jax.jit(fn)
            out = jax.block_until_ready(fc(x))
            compile_s = time.perf_counter() - t0
            y = np.asarray(jax.jit(lambda v, method=method:
                                   savgol_apply_sweep(v, ns, ms,
                                                      method=method))(x))
            if ref is None:
                ref = y
            err = np.abs(y - ref).max()
            per_step, ratio, _ = bench_chain(fn, x, iters=3, k=8,
                                             return_info=True)
            rate = C * N / per_step / 1e9
            print(f"{method:9s} chained {rate:7.3f} Gs/s/6cfg-agg "
                  f"({rate / C:6.3f}/cfg)  ratio {ratio:.2f}  "
                  f"err-vs-first {err:.2e}  [compile {compile_s:.0f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            print(f"{method:9s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
