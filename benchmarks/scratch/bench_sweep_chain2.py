import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops.sweep import savgol_apply_sweep

rng = np.random.default_rng(0)
def bench(fn, *a, iters=8, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
CHAIN = 8
N = 1_048_576
xs = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
for meth in ("pallas", "mxu"):
    def chain(v, meth=meth):
        acc = v
        for _ in range(CHAIN):
            y = savgol_apply_sweep(acc, ns, ms, method=meth)
            acc = y.sum(axis=0) * 1e-3 + acc
        return acc
    try:
        secs = bench(jax.jit(chain), xs, iters=5)
        per = secs / CHAIN
        print(f"sweep_{meth:7s}  {8*N/per/1e9:8.3f} Gs/s total ({N/per/1e9:6.3f}/cfg/call)", flush=True)
    except Exception as e:
        print(f"sweep_{meth} FAILED {type(e).__name__} {str(e)[:100]}", flush=True)
# correctness after kernel regroup
got = np.asarray(jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="pallas"))(xs[:4096]))
want = np.asarray(jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="xla"))(xs[:4096]))
print("sweep pallas err vs xla:", float(np.abs(got - want).max()), flush=True)

# chained 1D VPU after tap grouping (sanity)
flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
xb = jnp.asarray(rng.standard_normal((128, N)), dtype=jnp.float32)
def chainV(v):
    y = flt.apply(v, method="pallas")
    for _ in range(CHAIN - 1):
        y = flt.apply(y, method="pallas")
    return y
secs = bench(jax.jit(chainV), xb, iters=5)
print(f"1d_vpu chained  {128*N/(secs/CHAIN)/1e9:8.2f} Gs/s/call", flush=True)
