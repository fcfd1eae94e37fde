import os, time
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

def mkxw(x_ref, r_ref, b_ref, c_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    return jnp.concatenate([top, bottom], axis=0)

def run(name, kernel):
    try:
        f = pl.pallas_call(kernel, grid=grid, in_specs=xspecs,
                           out_specs=ospec, out_shape=oshape)
        jf = jax.jit(lambda v: f(v, v, v, v))
        print(f"{name:26s} {NPIX/bench(jf, x)/1e9:8.2f} Gpix/s", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED {str(e)[:90]}", flush=True)

# random immediates, rmw per row (exact real structure, const weights)
def k_rmw_const(x_ref, r_ref, b_ref, c_ref, o_ref):
    xw = mkxw(x_ref, r_ref, b_ref, c_ref)
    for wy in range(11):
        slab = xw[wy:wy + rows, :]
        row = float(wnp[wy, 0]) * slab[:, 0:cols]
        for wx in range(1, 11):
            row = row + float(wnp[wy, wx]) * slab[:, wx:wx + cols]
        if wy == 0: o_ref[0] = row
        else: o_ref[0] = o_ref[0] + row
run("rmw_const_random_w", k_rmw_const)

# lane-only 11 taps with random immediates (no CSE possible)
def k_lane(x_ref, r_ref, b_ref, c_ref, o_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    acc = float(wnp[0, 0]) * top[:, 0:cols]
    for wx in range(1, 11):
        acc = acc + float(wnp[0, wx]) * top[:, wx:wx + cols]
    o_ref[0] = acc
run("lane11_random_w", k_lane)

# sublane-only 11 taps
def k_sub(x_ref, r_ref, b_ref, c_ref, o_ref):
    bottom = jnp.concatenate([x_ref[0], b_ref[0]], axis=0)
    acc = float(wnp[0, 0]) * bottom[0:rows, :]
    for wy in range(1, 11):
        acc = acc + float(wnp[1, wy]) * bottom[wy:wy + rows, :]
    o_ref[0] = acc
run("sublane11_random_w", k_sub)

# separable rank-2 fused, random u,v immediates, rmw per rank
u2 = np.random.default_rng(2).standard_normal((2, 11)).astype(np.float32)
v2 = np.random.default_rng(3).standard_normal((2, 11)).astype(np.float32)
def k_sep(x_ref, r_ref, b_ref, c_ref, o_ref):
    xw = mkxw(x_ref, r_ref, b_ref, c_ref)
    for k in range(2):
        row = float(v2[k, 0]) * xw[:, 0:cols]
        for wx in range(1, 11):
            row = row + float(v2[k, wx]) * xw[:, wx:wx + cols]
        col = float(u2[k, 0]) * row[0:rows, :]
        for wy in range(1, 11):
            col = col + float(u2[k, wy]) * row[wy:wy + rows, :]
        if k == 0: o_ref[0] = col
        else: o_ref[0] = o_ref[0] + col
run("sep_rank2_const", k_sep)
