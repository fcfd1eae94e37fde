import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from savgol_tpu.ops.sweep import savgol_weights_masked, _bank_conv_xla, savgol_apply_sweep
from savgol_tpu.ops.pallas_conv import correlate_valid_bank_pallas

rng = np.random.default_rng(0)
xs = jnp.asarray(rng.standard_normal(131072), dtype=jnp.float32)
ns = jnp.asarray([4, 8, 12, 16, 24, 32, 6, 20])
ms = jnp.asarray([2, 3, 4, 4, 5, 6, 3, 4])

def bench(fn, *a, iters=20, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# 1. weights alone
wfn = jax.jit(lambda n, m: jax.vmap(lambda a, b: savgol_weights_masked(a, b, 0, jnp.float32))(n, m))
print(f"weights_masked_x8   {bench(wfn, ns, ms)*1e3:8.3f} ms", flush=True)

# 2. bank corr alone (fixed weights)
C = np.zeros((8, 65), np.float32); C[:, 30:35] = 0.2
Cw = jnp.asarray(C)
xp = jnp.pad(xs, (32, 32))
bfn = jax.jit(lambda v: correlate_valid_bank_pallas(v, Cw))
print(f"bank_corr_alone     {bench(bfn, xp)*1e3:8.3f} ms", flush=True)
xfn = jax.jit(lambda v: _bank_conv_xla(v, Cw))
print(f"xla_conv_alone      {bench(xfn, xp)*1e3:8.3f} ms", flush=True)

# 3. full sweep (pallas)
ffn = jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="pallas"))
print(f"full_sweep_pallas   {bench(ffn, xs)*1e3:8.3f} ms", flush=True)

# 4. full minus edge fix: non-poly boundary
from savgol_tpu.config import BoundaryMode
gfn = jax.jit(lambda v: savgol_apply_sweep(v, ns, ms, method="pallas", boundary=BoundaryMode.CONSTANT))
print(f"sweep_noedge        {bench(gfn, xs)*1e3:8.3f} ms", flush=True)
