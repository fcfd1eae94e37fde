"""Tile retune for the EXACT (HIGHEST) rowmxu kernel + dispatch threshold
re-derivation against the dense const-baked kernel.

probe_stack_tiles.py discovered the exact rowmxu path is ~37% faster at
128x1024 tiles than the 256x512 default (which was tuned for the bf16
single-pass form; at HIGHEST each band is 6 bf16 matmuls, shifting the
compute/VMEM balance). This probe: single-stencil valid kernels, ws sweep,
both tile shapes, dense kernel in the same process, 3 interleaved reps,
chained k-difference. The identical crop+pad chain glue is shared by all
paths (ratios are fair; absolute rates slightly understate the kernel).

Run ON TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/probe_tiles_exact.py
"""

from __future__ import annotations

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


def _chain(fn, x, *, iters=8, k=16):
    # k=16: single-stencil steps are ~0.5-1 ms; short chains are swamped
    # by host/tunnel jitter (k=2 produced NEGATIVE rates, k=8 3x spread).
    # The longer chain amortizes jitter without new Mosaic compiles.
    return bench_chain(fn, x, iters=iters, k=k, feedback_scale=1e-2)


def main():
    rng = np.random.default_rng(0)
    R = C = 2048
    npix = R * C
    hp = jax.lax.Precision.HIGHEST

    for ws in (11, 13, 17, 25):
        hw = (ws - 1) // 2
        w_np = savgol2d_weights_np(Savgol2DConfig(hw, hw, min(3, ws - 2)))
        wj = jnp.asarray(w_np, dtype=jnp.float32)
        img = jnp.asarray(rng.standard_normal((R + ws - 1, C + ws - 1)),
                          dtype=jnp.float32)

        def crop_pad(y):
            return jnp.pad(y, ((hw, hw), (hw, hw)))

        paths = {
            "256x512": lambda v: crop_pad(
                pc.correlate2d_valid_pallas_rowmxu(
                    v, wj, rows=256, cols=512, mxu_precision=hp)),
            "128x512": lambda v: crop_pad(
                pc.correlate2d_valid_pallas_rowmxu(
                    v, wj, rows=128, cols=512, mxu_precision=hp)),
            "128x1024": lambda v: crop_pad(
                pc.correlate2d_valid_pallas_rowmxu(
                    v, wj, rows=128, cols=1024, mxu_precision=hp)),
        }
        # correctness gate (small crop)
        ref = None
        for name, fn in paths.items():
            got = np.asarray(fn(img[:300, :300]))
            if ref is None:
                ref = got
            else:
                err = np.abs(got - ref).max() / max(1.0, np.abs(ref).max())
                assert err < 1e-5, (ws, name, err)

        reps = {name: [] for name in paths}
        for _ in range(3):
            for name, fn in paths.items():
                reps[name].append(npix / _chain(fn, img) / 1e9)
        row = "  ".join(f"{name} {min(v):.2f}-{max(v):.2f}"
                        for name, v in reps.items())
        print(f"ws={ws:2d}  {row}  Gpix/s")


if __name__ == "__main__":
    main()
