import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply2d import correlate2d_valid

rng = np.random.default_rng(0)
def bench(fn, *a, iters=15, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
w_np = np.asarray(f2.weights)
imgp = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
for rows2, cols2 in [(128, 1024), (128, 2048), (256, 1024), (256, 2048)]:
    try:
        fn = jax.jit(lambda v, r=rows2, c=cols2: pc.correlate2d_valid_pallas_sep(
            v, w_np, rows=r, cols=c, engine="mxu"))
        secs = bench(fn, imgp, iters=10)
        print(f"sepmxu r{rows2} c{cols2:4d}  {4*2048*2048/secs/1e9:7.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"sepmxu r{rows2} c{cols2} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
got = np.asarray(pc.correlate2d_valid_pallas_sep(small, w_np, engine="mxu"))
want = np.asarray(correlate2d_valid(small, f2.weights))
print("sepmxu err_vs_xla", float(np.abs(got-want).max()), flush=True)
# 33x33 order-4
fbig = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4), dtype=jnp.float32)
wb = np.asarray(fbig.weights)
try:
    fn = jax.jit(lambda v: pc.correlate2d_valid_pallas_sep(v, wb, engine="mxu"))
    secs = bench(fn, imgp, iters=10)
    gotb = np.asarray(pc.correlate2d_valid_pallas_sep(small, wb, engine="mxu"))
    wantb = np.asarray(correlate2d_valid(small, fbig.weights))
    print(f"sepmxu 33x33 o4     {4*2048*2048/secs/1e9:7.2f} Gpix/s  err {np.abs(gotb-wantb).max():.2e}", flush=True)
except Exception as e:
    print(f"sepmxu 33 FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
try:
    fnd = jax.jit(lambda v: pc.correlate2d_valid_pallas(v, jnp.asarray(wb)))
    secs = bench(fnd, imgp, iters=10)
    print(f"dense 33x33 o4      {4*2048*2048/secs/1e9:7.2f} Gpix/s", flush=True)
except Exception as e:
    print(f"dense 33 FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
