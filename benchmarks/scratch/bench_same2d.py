import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg

rng = np.random.default_rng(0)
def bench(fn, *a, iters=8, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

CHAIN = 8
f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
img = jnp.asarray(rng.standard_normal((4, 2048, 2048)), dtype=jnp.float32)
NPIX = 4 * 2048 * 2048
def chain(v):
    y = f2.apply(v)
    for _ in range(CHAIN - 1):
        y = f2.apply(y)
    return y
secs = bench(jax.jit(chain), img, iters=5)
print(f"api_default chained  {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)
# correctness on hardware
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
got = np.asarray(jax.jit(lambda v: f2.apply(v))(small))
want = np.asarray(jax.jit(lambda v: f2.apply(v, method="xla"))(small))
print("api err vs xla:", float(np.abs(got-want).max()), flush=True)
