import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import savgol_tpu as sg

rng = np.random.default_rng(0)
def bench_vary(fn, xs, iters=16, warmup=4):
    for i in range(warmup): out = fn(xs[i % len(xs)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters): outs.append(fn(xs[i % len(xs)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters

def bench_fixed(fn, x, iters=16, warmup=4):
    for _ in range(warmup): out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters): outs.append(fn(x))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters

B, RR, CC = 4, 2080, 2176
HALO_R, LANES = 32, 128
rows, cols = 128, 1024
xs2 = [jnp.asarray(rng.standard_normal((B, RR, CC)), dtype=jnp.float32)
       for _ in range(2)]
wnp = np.random.default_rng(1).standard_normal((11, 11)).astype(np.float32)
out_r, out_c = RR - HALO_R, CC - LANES
NPIX = B * out_r * out_c
grid = (B, out_r // rows, out_c // cols)
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

def k_const(x_ref, r_ref, b_ref, c_ref, o_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    for wy in range(11):
        slab = xw[wy:wy + rows, :]
        row = float(wnp[wy, 0]) * slab[:, 0:cols]
        for wx in range(1, 11):
            row = row + float(wnp[wy, wx]) * slab[:, wx:wx + cols]
        if wy == 0: o_ref[0] = row
        else: o_ref[0] = o_ref[0] + row

f = pl.pallas_call(k_const, grid=grid, in_specs=xspecs, out_specs=ospec,
                   out_shape=oshape)
jf = jax.jit(lambda v: f(v, v, v, v))
print(f"2dconst fixed-in   {NPIX/bench_fixed(jf, xs2[0])/1e9:8.2f} Gpix/s", flush=True)
print(f"2dconst varied-in  {NPIX/bench_vary(jf, xs2)/1e9:8.2f} Gpix/s", flush=True)

# headline re-check with varied inputs
N = 1_048_576
xb = [jnp.asarray(rng.standard_normal((128, N)), dtype=jnp.float32)
      for _ in range(2)]
flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
hfn = jax.jit(lambda v: flt.apply(v))
print(f"headline fixed-in  {128*N/bench_fixed(hfn, xb[0])/1e9:8.2f} Gs/s", flush=True)
print(f"headline varied-in {128*N/bench_vary(hfn, xb)/1e9:8.2f} Gs/s", flush=True)
