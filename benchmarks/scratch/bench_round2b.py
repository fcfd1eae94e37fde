import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.sweep import savgol_apply_sweep
from savgol_tpu.ops.apply2d import correlate2d_valid

rng = np.random.default_rng(0)

def bench(fn, x, iters=15, warmup=3):
    for _ in range(warmup): out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# ---- 2D grouped variants ----------------------------------------------------
f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
imgp = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
for rg, rows2, cols2, vl in [(1, 128, 1024, None),
                             (4, 128, 1024, 64<<20),
                             (8, 128, 1024, 96<<20),
                             (11, 128, 512, 64<<20),
                             (4, 128, 2048, 100<<20)]:
    try:
        fn2 = jax.jit(lambda v, rg=rg, r=rows2, c=cols2, vl=vl:
                      pc.correlate2d_valid_pallas(v, f2.weights, rows=r,
                                                  cols=c, row_group=rg,
                                                  vmem_limit=vl))
        secs2 = bench(fn2, imgp, iters=10)
        print(f"2d rg{rg:2d} r{rows2} c{cols2:4d} vl{(vl or 0)>>20:3d}M  {4*2048*2048/secs2/1e9:7.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"2d rg{rg} r{rows2} c{cols2} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
try:
    got = np.asarray(pc.correlate2d_valid_pallas(small, f2.weights))
    want = np.asarray(correlate2d_valid(small, f2.weights))
    print("2d default err_vs_xla", float(np.abs(got-want).max()), flush=True)
except Exception as e:
    print("2d default small FAILED", str(e)[:200], flush=True)

# ---- 1D MXU col variants ----------------------------------------------------
B, N, n, m = 128, 1_048_576, 12, 4
x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
f = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=jnp.float32)
xla = jax.jit(lambda v: f.apply(v, method="xla"))
yref = np.asarray(xla(x[:8]))
for name, kw in {"mxu_c1024": dict(cols=1024),
                 "mxu_c4096": dict(cols=4096),
                 "mxu_c4096_stacked": dict(cols=4096, stacked=True)}.items():
    try:
        fn = jax.jit(lambda v, kw=kw: pc.savgol_polynomial_pallas_mxu(
            v, f.center_weights, f.edge_weights, n, f.dt_inv, **kw))
        secs = bench(fn, x)
        err = float(np.abs(np.asarray(fn(x[:8])) - yref).max())
        print(f"{name:22s} {B*N/secs/1e9:8.2f} Gs/s  err {err:.3e}", flush=True)
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

# ---- sweep ------------------------------------------------------------------
xs = jnp.asarray(rng.standard_normal(131072), dtype=jnp.float32)
ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
want = None
for meth in ("xla", "pallas", "mxu"):
    try:
        fsw = jax.jit(lambda v, meth=meth: savgol_apply_sweep(v, ns, ms, method=meth))
        secs = bench(fsw, xs, iters=10)
        got = np.asarray(fsw(xs))
        if want is None: want = got
        err = float(np.abs(got - want).max())
        print(f"sweep_{meth:7s} {8*xs.size/secs/1e9:8.3f} Gs/s total ({xs.size/secs/1e9:6.3f}/cfg)  err {err:.3e}", flush=True)
    except Exception as e:
        print(f"sweep_{meth} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
