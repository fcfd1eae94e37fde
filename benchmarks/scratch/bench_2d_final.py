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

CHAIN = 8
f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
w = f2.weights
wnp = np.asarray(w)
img = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
NPIX = 4 * 2048 * 2048

def mkchain(one):
    def chain(v):
        y = one(v)
        for _ in range(CHAIN - 1):
            y = one(y)
        return y
    return jax.jit(chain)

runs = {
  "dense_const": lambda v: pc.correlate2d_valid_pallas(v, w),
  "sep_const_vpu": lambda v: pc.correlate2d_valid_pallas_sep(v, wnp, engine="vpu"),
}
for name, one in runs.items():
    try:
        secs = bench(mkchain(one), img)
        print(f"{name:16s} {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)
    except Exception as e:
        print(f"{name} FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

# correctness
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
want = np.asarray(correlate2d_valid(small, w))
for name, one in runs.items():
    got = np.asarray(jax.jit(one)(small))
    print(f"{name:16s} err {np.abs(got-want).max():.2e}", flush=True)

# the full default API path (apply with boundary pad) chained
def api_one(v):
    return f2.apply(v)[:, 5:-5, 5:-5]  # keep shapes shrinking like valid
secs = bench(mkchain(api_one), img)
print(f"api_default      {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)

# 33x33 order-4: sep-const vs dense-const
fbig = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4), dtype=jnp.float32)
wb = fbig.weights
wbnp = np.asarray(wb)
for name, one in {
    "dense_const_33": lambda v: pc.correlate2d_valid_pallas(v, wb),
    "sep_const_33": lambda v: pc.correlate2d_valid_pallas_sep(v, wbnp)}.items():
    try:
        secs = bench(mkchain(one), img, iters=5)
        print(f"{name:16s} {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)
    except Exception as e:
        print(f"{name} FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
