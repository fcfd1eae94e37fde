import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc

rng = np.random.default_rng(0)
def bench(fn, *a, iters=20, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

N = 1_048_576
x1 = jnp.asarray(rng.standard_normal((1, N)), dtype=jnp.float32)
w = jnp.asarray(np.random.default_rng(1).standard_normal(25), dtype=jnp.float32)
n_out = N - 24

# 1. fold construction alone
ffold = jax.jit(lambda v: pc._fold_rows(v, n_out)[0])
xh = ffold(x1)
print(f"fold_construct      {bench(ffold, x1)*1e3:8.3f} ms   shape {xh.shape}", flush=True)

# 2. kernel alone on pre-folded input (rows=32)
BR = xh.shape[0]
kfn = jax.jit(lambda v: pc._corr1d_call(v, w, 32, 2048, False))
print(f"corr1d_call_folded  {bench(kfn, xh)*1e3:8.3f} ms", flush=True)
kfn2 = jax.jit(lambda v: pc._corr1d_mxu_call(v, pc._valid_band_matrices(w), 128, 2048, False, jax.lax.Precision.HIGHEST))
print(f"mxu_call_folded     {bench(kfn2, xh)*1e3:8.3f} ms", flush=True)

# 3. full wrapper
wfn = jax.jit(lambda v: pc.correlate_valid_pallas(v, w))
print(f"wrapper_vpu         {bench(wfn, x1)*1e3:8.3f} ms", flush=True)
wfn2 = jax.jit(lambda v: pc.correlate_valid_pallas_mxu(v, w))
print(f"wrapper_mxu         {bench(wfn2, x1)*1e3:8.3f} ms", flush=True)

# 4. wide-batch reference (same total samples)
xb = jnp.asarray(rng.standard_normal((128, 8192+24)), dtype=jnp.float32)
bfn = jax.jit(lambda v: pc.correlate_valid_pallas(v, w))
print(f"wide_batch_vpu      {bench(bfn, xb)*1e3:8.3f} ms  (same 1M samples)", flush=True)
