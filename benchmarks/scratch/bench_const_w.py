import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import savgol_tpu as sg

rng = np.random.default_rng(0)
def bench(fn, *a, iters=20, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

LANES = 128
# --- 1D fused poly v2 structure with CONST weights, headline config -------
B, N, n = 128, 1_048_576, 12
ws = 2 * n + 1
f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
wc = np.asarray(f.center_weights)
ew = np.asarray(f.edge_weights)
ewl = ew[:, ::-1].copy()
ewt = ew[::-1, :].copy()
x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
rows, cols = 32, 2048
ewl_j = jnp.asarray(ewl); ewt_j = jnp.asarray(ewt)

def k_poly_const(ewl_ref, ewt_ref, left_ref, x_ref, right_ref, o_ref):
    ci = pl.program_id(1)
    n_ci = pl.num_programs(1)
    left = jnp.where(ci == 0, 0.0, left_ref[:, :])
    right = jnp.where(ci == n_ci - 1, 0.0, right_ref[:, :])
    xw = jnp.concatenate([left, x_ref[:, :], right], axis=1)
    acc = float(wc[0]) * xw[:, LANES - n:LANES - n + cols]
    for k in range(1, ws):
        acc = acc + float(wc[k]) * xw[:, LANES - n + k:LANES - n + k + cols]
    o_ref[:, :] = acc
    @pl.when(ci == 0)
    def _():
        first = xw[:, LANES:LANES + ws]
        lead = jax.lax.dot_general(first, ewl_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        o_ref[:, 0:n] = lead
    @pl.when(ci == n_ci - 1)
    def _():
        last = xw[:, LANES + cols - ws:LANES + cols]
        trail = jax.lax.dot_general(last, ewt_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        o_ref[:, cols - n:cols] = trail

cb = cols // LANES
last128 = N // LANES - 1
fcall = pl.pallas_call(
    k_poly_const,
    grid=(B // rows, N // cols),
    in_specs=[
        pl.BlockSpec((n, ws), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, ws), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANES),
                     lambda bi, ci: (bi, jnp.maximum(ci * cb - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANES),
                     lambda bi, ci: (bi, jnp.minimum((ci + 1) * cb, last128)),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((rows, cols), lambda bi, ci: (bi, ci),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
)
jf = jax.jit(lambda v: fcall(ewl_j, ewt_j, v, v, v))
secs = bench(jf, x)
y = np.asarray(jf(x))[:4]
want = np.asarray(f.apply(x[:4], method="xla"))
print(f"1d_poly_const r32   {B*N/secs/1e9:8.2f} Gs/s  err {np.abs(y-want).max():.2e}", flush=True)

for r2 in (8, 64, 128):
    fc2 = pl.pallas_call(
        k_poly_const,
        grid=(B // r2, N // cols),
        in_specs=[
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, LANES),
                         lambda bi, ci: (bi, jnp.maximum(ci * cb - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, cols), lambda bi, ci: (bi, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, LANES),
                         lambda bi, ci: (bi, jnp.minimum((ci + 1) * cb, last128)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r2, cols), lambda bi, ci: (bi, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )
    jf2 = jax.jit(lambda v, fc2=fc2: fc2(ewl_j, ewt_j, v, v, v))
    secs = bench(jf2, x)
    print(f"1d_poly_const r{r2:<4d}{B*N/secs/1e9:8.2f} Gs/s", flush=True)
