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
x = jnp.asarray(rng.standard_normal((B, RR, CC)), dtype=jnp.float32)

def make(kernel, rows, cols):
    out_r, out_c = RR - HALO_R, CC - LANES
    grid = (B, out_r // rows, out_c // cols)
    specs = [
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
    f = pl.pallas_call(
        kernel, grid=grid, in_specs=specs,
        out_specs=pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_r, out_c), jnp.float32),
        interpret=False)
    jf = jax.jit(lambda v: f(v, v, v, v))
    secs = bench(jf, x)
    return B * out_r * out_c / secs / 1e9

def taps_kernel(wh, ww, rows, cols, rmw):
    def k(x_ref, r_ref, b_ref, c_ref, o_ref):
        top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
        bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
        xw = jnp.concatenate([top, bottom], axis=0)
        acc = None
        for wy in range(wh):
            slab = xw[wy:wy + rows, :]
            row = 0.01 * (wy + 1) * slab[:, 0:cols]
            for wx in range(1, ww):
                row = row + 0.01 * (wx + 1) * slab[:, wx:wx + cols]
            if rmw:
                if wy == 0: o_ref[0] = row
                else: o_ref[0] = o_ref[0] + row
            else:
                acc = row if acc is None else acc + row
        if not rmw:
            o_ref[0] = acc
    return k

for wh, ww, rows, cols, rmw in [(5,5,128,1024,True), (7,7,128,1024,True),
                                 (9,9,128,1024,True), (11,11,128,1024,True),
                                 (11,11,128,512,True), (11,11,64,512,True),
                                 (11,11,32,256,True), (7,7,128,1024,False)]:
    try:
        g = make(taps_kernel(wh, ww, rows, cols, rmw), rows, cols)
        print(f"{wh}x{ww} r{rows} c{cols} rmw={int(rmw)}  {g:7.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"{wh}x{ww} r{rows} c{cols} FAILED {str(e)[:100]}", flush=True)
