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
wspec = pl.BlockSpec((11, 11), lambda b, ri, ci: (0, 0),
                     memory_space=pltpu.SMEM)
ospec = pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                     memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((B, out_r, out_c), jnp.float32)

def mkxw(x_ref, r_ref, b_ref, c_ref):
    top = jnp.concatenate([x_ref[0], r_ref[0]], axis=1)
    bottom = jnp.concatenate([b_ref[0], c_ref[0]], axis=1)
    return jnp.concatenate([top, bottom], axis=0)

def loop(xw, getw, o_ref):
    for wy in range(11):
        slab = xw[wy:wy + rows, :]
        row = getw(wy, 0) * slab[:, 0:cols]
        for wx in range(1, 11):
            row = row + getw(wy, wx) * slab[:, wx:wx + cols]
        if wy == 0: o_ref[0] = row
        else: o_ref[0] = o_ref[0] + row

def k_inline(w_ref, x_ref, r_ref, b_ref, c_ref, o_ref):
    loop(mkxw(x_ref, r_ref, b_ref, c_ref), lambda a, b: w_ref[a, b], o_ref)
def k_hoist(w_ref, x_ref, r_ref, b_ref, c_ref, o_ref):
    ws = [[w_ref[a, b] for b in range(11)] for a in range(11)]
    loop(mkxw(x_ref, r_ref, b_ref, c_ref), lambda a, b: ws[a][b], o_ref)
def k_const(x_ref, r_ref, b_ref, c_ref, o_ref):
    loop(mkxw(x_ref, r_ref, b_ref, c_ref),
         lambda a, b: float(wnp[a, b]), o_ref)

# reference output via XLA for correctness
from savgol_tpu.ops.apply2d import correlate2d_valid
xs = x[:1, :300, :400]
want = np.asarray(correlate2d_valid(xs, w))

for name, k, withw in [("smem_inline", k_inline, True),
                       ("smem_hoist", k_hoist, True),
                       ("const", k_const, False)]:
    specs = ([wspec] + xspecs) if withw else xspecs
    f = pl.pallas_call(k, grid=grid, in_specs=specs, out_specs=ospec,
                       out_shape=oshape)
    args = (w, x, x, x, x) if withw else (x, x, x, x)
    jf = jax.jit(lambda *v: f(*v))
    secs = bench(jf, *args)
    # correctness: reuse the production wrapper geometry on the small image
    print(f"{name:14s} {NPIX/secs/1e9:8.2f} Gpix/s", flush=True)

# verify const output equals XLA on the big tile grid (slice compare)
f = pl.pallas_call(k_const, grid=grid, in_specs=xspecs, out_specs=ospec,
                   out_shape=oshape)
y = np.asarray(jax.jit(lambda v: f(v, v, v, v))(x))
xw_np = np.asarray(x[0])
ref = np.asarray(correlate2d_valid(x[0:1, :rows+10, :cols+10], w))[0]
np.testing.assert_allclose(y[0, :rows, :cols][:rows, :cols][ :ref.shape[0]-0, :ref.shape[1]-0][:min(rows,ref.shape[0]), :min(cols,ref.shape[1])],
                           ref[:min(rows,ref.shape[0]), :min(cols,ref.shape[1])], atol=2e-4)
print("const output CORRECT vs XLA", flush=True)
