import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc

rng = np.random.default_rng(0)
B, N, n, m = 128, 1_048_576, 12, 4
x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=jnp.float32)

def bench(fn, iters=20, warmup=3):
    for _ in range(warmup): out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out

ref = None
P = jax.lax.Precision
variants = {
  "vpu_v2": jax.jit(lambda v: f.apply(v, method="pallas")),
  "mxu_r128_c2048_HIGHEST": jax.jit(lambda v: pc.savgol_polynomial_pallas_mxu(
      v, f.center_weights, f.edge_weights, n, f.dt_inv, rows=128, cols=2048)),
  "mxu_r256_c4096_HIGHEST": jax.jit(lambda v: pc.savgol_polynomial_pallas_mxu(
      v, f.center_weights, f.edge_weights, n, f.dt_inv, rows=256, cols=4096)),
  "mxu_r128_c2048_DEFAULT": jax.jit(lambda v: pc.savgol_polynomial_pallas_mxu(
      v, f.center_weights, f.edge_weights, n, f.dt_inv, rows=128, cols=2048,
      mxu_precision=P.DEFAULT)),
  "mxu_r512_c4096_HIGHEST": jax.jit(lambda v: pc.savgol_polynomial_pallas_mxu(
      v, f.center_weights, f.edge_weights, n, f.dt_inv, rows=512, cols=4096)),
}
xla = jax.jit(lambda v: f.apply(v, method="xla"))
yref = np.asarray(xla(x[:8]))
for name, fn in variants.items():
    try:
        secs, out = bench(fn)
        err = float(np.abs(np.asarray(fn(x[:8])) - yref).max())
        print(f"{name:28s} {B*N/secs/1e9:8.2f} Gs/s  ({secs*1e3:7.3f} ms)  err_vs_xla {err:.3e}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
