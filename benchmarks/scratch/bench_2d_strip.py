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

B, RR, CC = 4, 2080, 2176     # padded-ish
rows, cols, HALO_R, LANES = 128, 1024, 32, 128
x = jnp.asarray(rng.standard_normal((B, RR, CC)), dtype=jnp.float32)
out_r, out_c = RR - HALO_R, CC - LANES
grid = (B, out_r // rows, out_c // cols)
NPIX = B * out_r * out_c

def run(kernel, nviews):
    specs = [pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                          memory_space=pltpu.VMEM)]
    if nviews == 4:
        specs += [
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
    args = (x,) * (1 if nviews == 1 else 4)
    jf = jax.jit(lambda *v: f(*v))
    secs = bench(jf, *args)
    return NPIX / secs / 1e9

def k_copy(x_ref, o_ref):
    o_ref[0] = x_ref[0] * 2.0
print(f"A copy-only 1view    {run(k_copy, 1):7.2f} Gpix/s", flush=True)

def k_views(x_ref, r_ref, b_ref, c_ref, o_ref):
    o_ref[0] = x_ref[0] * 2.0 + r_ref[0, :, 0:1] + b_ref[0, 0:1, :] + c_ref[0, 0, 0]
print(f"B 4views-no-concat   {run(k_views, 4):7.2f} Gpix/s", flush=True)

def k_concat(x_ref, r_ref, b_ref, c_ref, o_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    o_ref[0] = xw[0:rows, 0:cols] * 2.0
print(f"C 4views+concat      {run(k_concat, 4):7.2f} Gpix/s", flush=True)

def k_tap9(x_ref, r_ref, b_ref, c_ref, o_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    xw = jnp.concatenate([top, bottom], axis=0)
    acc = None
    for wy in range(3):
        slab = xw[wy:wy + rows, :]
        row = 0.1 * slab[:, 0:cols]
        for wx in range(1, 3):
            row = row + 0.1 * slab[:, wx:wx + cols]
        acc = row if acc is None else acc + row
    o_ref[0] = acc
print(f"D concat+3x3 taps    {run(k_tap9, 4):7.2f} Gpix/s", flush=True)

def k_lane_only(x_ref, r_ref, b_ref, c_ref, o_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    acc = 0.1 * top[:, 0:cols]
    for wx in range(1, 9):
        acc = acc + 0.1 * top[:, wx:wx + cols]
    o_ref[0] = acc
print(f"E lane-shifts x9     {run(k_lane_only, 4):7.2f} Gpix/s", flush=True)

def k_sub_only(x_ref, r_ref, b_ref, c_ref, o_ref):
    bottom = jnp.concatenate([x_ref[0], b_ref[0]], axis=0)
    acc = 0.1 * bottom[0:rows, :]
    for wy in range(1, 9):
        acc = acc + 0.1 * bottom[wy:wy + rows, :]
    o_ref[0] = acc
print(f"F sublane-shifts x9  {run(k_sub_only, 4):7.2f} Gpix/s", flush=True)
