import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
def bench(fn, *a, iters=15, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

B, RR, CC = 4, 2080, 2176
HALO_R, LANES = 32, 128
rows, cols = 128, 1024
x = jnp.asarray(rng.standard_normal((B, RR, CC)), dtype=jnp.float32)
wnp = np.random.default_rng(1).standard_normal((11, 11)).astype(np.float32)
w = jnp.asarray(wnp)
out_r, out_c = RR - HALO_R, CC - LANES
grid = (B, out_r // rows, out_c // cols)
NPIX = B * out_r * out_c

xspecs = [
    pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                 memory_space=pltpu.VMEM),
    pl.BlockSpec((1, rows, LANES),
                 lambda b, ri, ci: (b, ri, (ci + 1) * (cols // LANES)),
                 memory_space=pltpu.VMEM),
    pl.BlockSpec((1, HALO_R, cols),
                 lambda b, ri, ci: (b, (ri + 1) * (rows // HALO_R), ci),
                 memory_space=pltpu.VMEM),
    pl.BlockSpec((1, HALO_R, LANES),
                 lambda b, ri, ci: (b, (ri + 1) * (rows // HALO_R),
                                    (ci + 1) * (cols // LANES)),
                 memory_space=pltpu.VMEM)]
ospec = pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                     memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((B, out_r, out_c), jnp.float32)

def body(xw, getw):
    acc = None
    for wy in range(11):
        slab = xw[wy:wy + rows, :]
        row = getw(wy, 0) * slab[:, 0:cols]
        for wx in range(1, 11):
            row = row + getw(wy, wx) * slab[:, wx:wx + cols]
        acc = row if acc is None else acc + row
    return acc

def mkxw(x_ref, r_ref, b_ref, c_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    return jnp.concatenate([top, bottom], axis=0)

# (a) baked immediates
def k_const(x_ref, r_ref, b_ref, c_ref, o_ref):
    o_ref[0] = body(mkxw(x_ref, r_ref, b_ref, c_ref),
                    lambda a, b: float(wnp[a, b]))
f = pl.pallas_call(k_const, grid=grid, in_specs=xspecs, out_specs=ospec,
                   out_shape=oshape)
jf = jax.jit(lambda v: f(v, v, v, v))
print(f"const_weights     {NPIX/bench(jf, x)/1e9:7.2f} Gpix/s", flush=True)

# (b) SMEM per-tap reads (current real kernel)
def k_smem(w_ref, x_ref, r_ref, b_ref, c_ref, o_ref):
    o_ref[0] = body(mkxw(x_ref, r_ref, b_ref, c_ref),
                    lambda a, b: w_ref[a, b])
f = pl.pallas_call(k_smem, grid=grid,
                   in_specs=[pl.BlockSpec((11, 11), lambda b, ri, ci: (0, 0),
                                          memory_space=pltpu.SMEM)] + xspecs,
                   out_specs=ospec, out_shape=oshape)
jf = jax.jit(lambda v: f(w, v, v, v, v))
print(f"smem_per_tap      {NPIX/bench(jf, x)/1e9:7.2f} Gpix/s", flush=True)

# (c) SMEM reads hoisted before the loop
def k_smem_hoist(w_ref, x_ref, r_ref, b_ref, c_ref, o_ref):
    ws = [[w_ref[a, b] for b in range(11)] for a in range(11)]
    o_ref[0] = body(mkxw(x_ref, r_ref, b_ref, c_ref),
                    lambda a, b: ws[a][b])
f = pl.pallas_call(k_smem_hoist, grid=grid,
                   in_specs=[pl.BlockSpec((11, 11), lambda b, ri, ci: (0, 0),
                                          memory_space=pltpu.SMEM)] + xspecs,
                   out_specs=ospec, out_shape=oshape)
jf = jax.jit(lambda v: f(w, v, v, v, v))
print(f"smem_hoisted      {NPIX/bench(jf, x)/1e9:7.2f} Gpix/s", flush=True)
