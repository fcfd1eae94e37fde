import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.sweep import savgol_apply_sweep

rng = np.random.default_rng(0)
def bench(fn, *a, iters=20, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# single-row 1M valid corr: folded VPU vs folded MXU vs xla
N = 1_048_576
x1 = jnp.asarray(rng.standard_normal((1, N)), dtype=jnp.float32)
w = jnp.asarray(np.random.default_rng(1).standard_normal(25), dtype=jnp.float32)
from savgol_tpu.ops.apply import correlate_valid
want = np.asarray(correlate_valid(x1, w))
for name, fn in [("valid_fold_vpu", lambda v: pc.correlate_valid_pallas(v, w)),
                 ("valid_fold_mxu", lambda v: pc.correlate_valid_pallas_mxu(v, w))]:
    jfn = jax.jit(fn)
    secs = bench(jfn, x1)
    err = float(np.abs(np.asarray(jfn(x1)) - want).max())
    print(f"{name:18s} {N/secs/1e9:8.2f} Gs/s  err {err:.2e}", flush=True)

# config-1 shape: single 100k row through Savgol1D default
xc = jnp.asarray(rng.standard_normal((1, 100_000)), dtype=jnp.float32)
f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
for name, kw in [("cfg1_default", {}), ("cfg1_xla", {"method": "xla"}),
                 ("cfg1_vpu_forced", {"method": "pallas"})]:
    jfn = jax.jit(lambda v, kw=kw: f.apply(v, **kw))
    secs = bench(jfn, xc)
    err = float(np.abs(np.asarray(jfn(xc)) - np.asarray(f.apply(xc, method="xla"))).max())
    print(f"{name:18s} {100_000/secs/1e9:8.3f} Gs/s  err {err:.2e}", flush=True)

# sweep with folded bank
xs = jnp.asarray(rng.standard_normal(131072), dtype=jnp.float32)
ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
want = None
for meth in ("pallas", "xla"):
    jfn = jax.jit(lambda v, meth=meth: savgol_apply_sweep(v, ns, ms, method=meth))
    secs = bench(jfn, xs, iters=10)
    got = np.asarray(jfn(xs))
    if want is None: want = got
    err = float(np.abs(got - want).max())
    print(f"sweep_{meth:7s}      {8*xs.size/secs/1e9:8.3f} Gs/s total ({xs.size/secs/1e9:6.3f}/cfg) err {err:.2e}", flush=True)
