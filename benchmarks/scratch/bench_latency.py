import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from savgol_tpu.ops import pallas_conv as pc

rng = np.random.default_rng(0)
def bench(fn, *a, iters=50, warmup=5):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

tiny = jnp.ones((8, 128), jnp.float32)
f0 = jax.jit(lambda v: v + 1.0)
print(f"tiny_dispatch       {bench(f0, tiny)*1e3:8.3f} ms", flush=True)

N = 1_048_576
x1 = jnp.asarray(rng.standard_normal((1, N)), dtype=jnp.float32)
w = jnp.asarray(np.random.default_rng(1).standard_normal(25), dtype=jnp.float32)

# chained: 10 kernel invocations inside ONE jit (re-filter output)
def chain(v):
    y = pc.correlate_valid_pallas(v, w)
    for _ in range(9):
        y = pc.correlate_valid_pallas(y, w)
    return y
cfn = jax.jit(chain)
secs = bench(cfn, x1, iters=20)
print(f"chain10_fold_vpu    {secs*1e3:8.3f} ms  -> per-call {secs/10*1e3:.3f} ms  ({N/ (secs/10)/1e9:.1f} Gs/s)", flush=True)

def chain_mxu(v):
    y = pc.correlate_valid_pallas_mxu(v, w)
    for _ in range(9):
        y = pc.correlate_valid_pallas_mxu(y, w)
    return y
cfn2 = jax.jit(chain_mxu)
secs = bench(cfn2, x1, iters=20)
print(f"chain10_fold_mxu    {secs*1e3:8.3f} ms  -> per-call {secs/10*1e3:.3f} ms  ({N/(secs/10)/1e9:.1f} Gs/s)", flush=True)

# headline fused kernel single dispatch for comparison
import savgol_tpu as sg
xb = jnp.asarray(rng.standard_normal((128, N)), dtype=jnp.float32)
f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
hfn = jax.jit(lambda v: f.apply(v))
secs = bench(hfn, xb, iters=20)
print(f"headline_default    {secs*1e3:8.3f} ms  ({128*N/secs/1e9:.1f} Gs/s)", flush=True)
