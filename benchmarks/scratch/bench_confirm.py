import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply2d import correlate2d_valid

rng = np.random.default_rng(0)
def bench(fn, *a, iters=10, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# 33x33 compile + correctness + speed after tile shrink
fbig = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4), dtype=jnp.float32)
wb = fbig.weights
wbnp = np.asarray(wb)
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
wantb = np.asarray(correlate2d_valid(small, wb))
img = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
NPIX = 4 * 2048 * 2048
for name, one in {
    "dense_const_33": lambda v: pc.correlate2d_valid_pallas(v, wb),
    "sep_const_33": lambda v: pc.correlate2d_valid_pallas_sep(v, wbnp)}.items():
    try:
        got = np.asarray(jax.jit(one)(small))
        err = float(np.abs(got - wantb).max())
        secs = bench(jax.jit(one), img, iters=5)
        print(f"{name:16s} {NPIX/secs/1e9:8.2f} Gpix/s wall  err {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name} FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

# full bench.py
os.system("python bench.py 2>/dev/null | tail -1")
