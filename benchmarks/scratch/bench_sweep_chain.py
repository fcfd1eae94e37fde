import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from savgol_tpu.ops.sweep import savgol_apply_sweep

rng = np.random.default_rng(0)
def bench(fn, *a, iters=10, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])
CHAIN = 8
for meth in ("pallas", "mxu", "xla"):
    for N in (131072, 1_048_576):
        xs = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
        def chain(v, meth=meth):
            y = savgol_apply_sweep(v, ns, ms, method=meth)
            acc = y.sum(axis=0) * 1e-3 + v          # keep shape, feed back
            for _ in range(CHAIN - 1):
                y = savgol_apply_sweep(acc, ns, ms, method=meth)
                acc = y.sum(axis=0) * 1e-3 + acc
            return acc
        try:
            secs = bench(jax.jit(chain), xs, iters=5)
            per = secs / CHAIN
            print(f"sweep_{meth:7s} N={N:8d}  {8*N/per/1e9:8.3f} Gs/s total "
                  f"({N/per/1e9:6.3f}/cfg/call)", flush=True)
        except Exception as e:
            print(f"sweep_{meth} N={N} FAILED {type(e).__name__} {str(e)[:100]}", flush=True)
