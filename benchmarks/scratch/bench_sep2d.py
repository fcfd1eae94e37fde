import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.sweep import savgol_apply_sweep

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
# separable at a few tile shapes
for rows2, cols2 in [(128, 1024), (128, 2048), (256, 1024), (64, 2048)]:
    try:
        fn = jax.jit(lambda v, r=rows2, c=cols2: pc.correlate2d_valid_pallas_sep(
            v, w_np, rows=r, cols=c))
        secs = bench(fn, imgp, iters=10)
        print(f"sep2d r{rows2} c{cols2:4d}  {4*2048*2048/secs/1e9:7.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"sep2d r{rows2} c{cols2} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
# correctness on hardware
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
from savgol_tpu.ops.apply2d import correlate2d_valid
got = np.asarray(pc.correlate2d_valid_pallas_sep(small, w_np))
want = np.asarray(correlate2d_valid(small, f2.weights))
print("sep2d err_vs_xla", float(np.abs(got-want).max()), flush=True)
# 33x33 order-4 (max geometry)
fbig = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4), dtype=jnp.float32)
wb = np.asarray(fbig.weights)
fn = jax.jit(lambda v: pc.correlate2d_valid_pallas_sep(v, wb))
secs = bench(fn, imgp, iters=10)
print(f"sep2d 33x33 o4      {4*2048*2048/secs/1e9:7.2f} Gpix/s", flush=True)
fnd = jax.jit(lambda v: pc.correlate2d_valid_pallas(v, jnp.asarray(wb)))
secs = bench(fnd, imgp, iters=10)
print(f"dense2d 33x33 o4    {4*2048*2048/secs/1e9:7.2f} Gpix/s", flush=True)

# sweep after fold
xs = jnp.asarray(rng.standard_normal(131072), dtype=jnp.float32)
ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
want = None
for meth in ("pallas", "xla", "mxu"):
    jfn = jax.jit(lambda v, meth=meth: savgol_apply_sweep(v, ns, ms, method=meth))
    secs = bench(jfn, xs, iters=10)
    got = np.asarray(jfn(xs))
    if want is None: want = got
    err = float(np.abs(got - want).max())
    print(f"sweep_{meth:7s}  {8*xs.size/secs/1e9:8.3f} Gs/s total ({xs.size/secs/1e9:6.3f}/cfg) err {err:.2e}", flush=True)
# bigger sweep input (amortize dispatch)
xl = jnp.asarray(rng.standard_normal(1_048_576), dtype=jnp.float32)
jfn = jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="pallas"))
secs = bench(jfn, xl, iters=10)
print(f"sweep_pallas_1M  {8*xl.size/secs/1e9:8.3f} Gs/s total ({xl.size/secs/1e9:6.3f}/cfg)", flush=True)
