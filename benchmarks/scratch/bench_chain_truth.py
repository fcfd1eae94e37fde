import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc

rng = np.random.default_rng(0)
def bench(fn, *a, iters=10, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

CHAIN = 8
f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
w = f2.weights
wnp = np.asarray(w)
img = jnp.asarray(rng.standard_normal((4, 2058, 2058)), dtype=jnp.float32)
NPIX = 4 * 2048 * 2048

# (A) dense SMEM-weights kernel chained (output fed back with renorm)
def chainA(v):
    y = pc.correlate2d_valid_pallas(v, w)
    for _ in range(CHAIN - 1):
        y = pc.correlate2d_valid_pallas(y, w)
    return y
secs = bench(jax.jit(chainA), img)
print(f"dense_smem chained   {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)

# (B) sep (u,v via SMEM) chained
def chainB(v):
    y = pc.correlate2d_valid_pallas_sep(v, wnp, engine="vpu")
    for _ in range(CHAIN - 1):
        y = pc.correlate2d_valid_pallas_sep(y, wnp, engine="vpu")
    return y
secs = bench(jax.jit(chainB), img)
print(f"sep_vpu chained      {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)

# (C) const-weights dense kernel chained
HALO_R, LANES = 32, 128
rows, cols = 128, 1024
def const_call(v):
    B, R, C = v.shape
    out_r, out_c = R - 10, C - 10
    orp = -(-out_r // rows) * rows
    ocp = -(-out_c // cols) * cols
    vp = jnp.pad(v, ((0, 0), (0, orp + HALO_R - R), (0, ocp + LANES - C)))
    grid = (B, orp // rows, ocp // cols)
    def k(x_ref, r_ref, b_ref, c_ref, o_ref):
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
    out = pl.pallas_call(
        k, grid=grid, in_specs=xspecs,
        out_specs=pl.BlockSpec((1, rows, cols), lambda b, ri, ci: (b, ri, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, orp, ocp), jnp.float32))(
            vp, vp, vp, vp)
    return out[:, :out_r, :out_c]

def chainC(v):
    y = const_call(v)
    for _ in range(CHAIN - 1):
        y = const_call(y)
    return y
secs = bench(jax.jit(chainC), img)
print(f"dense_const chained  {NPIX/(secs/CHAIN)/1e9:8.2f} Gpix/s/call", flush=True)

# correctness of const_call vs XLA
from savgol_tpu.ops.apply2d import correlate2d_valid
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
got = np.asarray(jax.jit(const_call)(small))
want = np.asarray(correlate2d_valid(small, w))
print("const err vs xla:", float(np.abs(got - want).max()), flush=True)

# (D) 1D headline MXU chained
flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
xb = jnp.asarray(rng.standard_normal((128, 1_048_576)), dtype=jnp.float32)
def chainD(v):
    y = flt.apply(v)
    for _ in range(CHAIN - 1):
        y = flt.apply(y)
    return y
secs = bench(jax.jit(chainD), xb, iters=5)
print(f"1d_headline chained  {128*1_048_576/(secs/CHAIN)/1e9:8.2f} Gs/s/call", flush=True)

# (E) 1D VPU kernel chained
def chainE(v):
    y = flt.apply(v, method="pallas")
    for _ in range(CHAIN - 1):
        y = flt.apply(y, method="pallas")
    return y
secs = bench(jax.jit(chainE), xb, iters=5)
print(f"1d_vpu chained       {128*1_048_576/(secs/CHAIN)/1e9:8.2f} Gs/s/call", flush=True)
