"""Probe: fused plane-Cholesky kernel cost vs (k, rcond, tile).

The masked2d pipeline REGRESSED with the Pallas plane solve (9 -> 3
Mpix/s wall): the k = 10 kernel runs ~1.3 ms per (8, 512) tile while the
k = 5 kernel is ~us-scale. This probe times _raw_plane_solve directly
across k, rcond, and tile geometry to find the cliff.

Run ON TPU:  python benchmarks/probe_psolve.py
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

    from savgol_tpu.ops.pallas_solve import _plane_solve_call, _PairKey

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def problem(k, pos):
        kp = k * (k + 1) // 2
        pidx = np.zeros((k, k), np.int32)
        c = 0
        for a in range(k):
            for b in range(a, k):
                pidx[a, b] = pidx[b, a] = c
                c += 1
        A = rng.standard_normal((pos, 2 * k, k)).astype(np.float32)
        G = np.einsum("nti,ntj->nij", A, A)
        gram = np.stack([G[:, a, b] for a in range(k)
                         for b in range(a, k)])
        rhs = rng.standard_normal((k, pos)).astype(np.float32)
        quo = np.ones(pos, bool)
        return (jnp.asarray(gram), pidx, jnp.asarray(rhs),
                jnp.asarray(quo))

    pos = 1 << 20
    for k in (5, 10):
        gram, pidx, rhs, quo = problem(k, pos)
        key = _PairKey(pidx)
        for rcond in (None, 1e-6):
            for rows, cols in ((8, 128), (8, 256), (8, 512), (8, 1024),
                               (16, 512), (32, 512), (8, 2048)):
                try:
                    t0 = time.perf_counter()
                    out = _plane_solve_call(gram, rhs, quo, key, rcond,
                                            rows, cols, False)
                    jax.block_until_ready(out)
                    comp = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    for _ in range(5):
                        out = _plane_solve_call(gram, rhs, quo, key,
                                                rcond, rows, cols, False)
                    jax.block_until_ready(out)
                    wall = (time.perf_counter() - t0) / 5
                    print(f"k={k} rcond={rcond} tile=({rows},{cols}): "
                          f"{wall*1e3:9.2f} ms = "
                          f"{pos/wall/1e9:7.3f} Gpos/s "
                          f"[compile {comp:.0f}s]", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"k={k} rcond={rcond} tile=({rows},{cols}) "
                          f"FAILED: {e}"[:150], flush=True)


if __name__ == "__main__":
    main()
