import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.sweep import savgol_apply_sweep

P = jax.lax.Precision
rng = np.random.default_rng(0)

def bench(fn, x, iters=20, warmup=3):
    for _ in range(warmup): out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# ---- 1D MXU variants -------------------------------------------------------
B, N, n, m = 128, 1_048_576, 12, 4
x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=jnp.float32)
xla = jax.jit(lambda v: f.apply(v, method="xla"))
yref = np.asarray(xla(x[:8]))
variants = {
  "mxu_stacked_HIGHEST": dict(stacked=True),
  "mxu_3dot_HIGH": dict(mxu_precision=P.HIGH),
  "mxu_stacked_HIGH": dict(stacked=True, mxu_precision=P.HIGH),
  "mxu_r256_3dot_HIGHEST_c8192": dict(rows=256, cols=8192),
}
for name, kw in variants.items():
    try:
        fn = jax.jit(lambda v, kw=kw: pc.savgol_polynomial_pallas_mxu(
            v, f.center_weights, f.edge_weights, n, f.dt_inv, **kw))
        secs = bench(fn, x)
        err = float(np.abs(np.asarray(fn(x[:8])) - yref).max())
        print(f"{name:30s} {B*N/secs/1e9:8.2f} Gs/s  err {err:.3e}", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

# ---- 2D value-acc kernel ---------------------------------------------------
img = jnp.asarray(rng.standard_normal((4, 2048, 2048)), dtype=jnp.float32)
f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
for rows2, cols2 in [(128, 1024), (128, 2048), (256, 1024)]:
    try:
        fn2 = jax.jit(lambda v, r=rows2, c=cols2: pc.correlate2d_valid_pallas(
            v, f2.weights, rows=r, cols=c))
        imgp = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
        secs2 = bench(fn2, imgp, iters=10)
        print(f"2d_valueacc_r{rows2}_c{cols2}        {4*2048*2048/secs2/1e9:8.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"2d r{rows2} c{cols2} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

# 2D correctness on hardware
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
got = np.asarray(pc.correlate2d_valid_pallas(small, f2.weights))
from savgol_tpu.ops.apply2d import correlate2d_valid
want = np.asarray(correlate2d_valid(small, f2.weights))
print("2d err_vs_xla", float(np.abs(got-want).max()), flush=True)

# ---- sweep ------------------------------------------------------------------
xs = jnp.asarray(rng.standard_normal(131072), dtype=jnp.float32)
ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
for meth in ("pallas", "mxu"):
    try:
        fsw = jax.jit(lambda v, meth=meth: savgol_apply_sweep(v, ns, ms, method=meth))
        secs = bench(fsw, xs, iters=10)
        got = np.asarray(fsw(xs))
        want = np.asarray(jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="xla"))(xs))
        err = float(np.abs(got - want).max())
        print(f"sweep_{meth:7s} {8*xs.size/secs/1e9:8.3f} Gs/s total ({xs.size/secs/1e9:6.3f}/cfg)  err_vs_xla {err:.3e}", flush=True)
    except Exception as e:
        print(f"sweep_{meth} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
# xla-path absolute timing too
fsw = jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="xla"))
secs = bench(fsw, xs, iters=10)
print(f"sweep_xla     {8*xs.size/secs/1e9:8.3f} Gs/s total", flush=True)
