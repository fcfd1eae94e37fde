import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import savgol_tpu as sg

rng = np.random.default_rng(0)
def bench(fn, *a, iters=8, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

LANES = 128
B, N, n = 128, 1_048_576, 12
ws = 2 * n + 1
f = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
wc = np.asarray(f.center_weights, dtype=np.float64)
ew = np.asarray(f.edge_weights)
ewl_j = jnp.asarray(ew[:, ::-1].copy())
ewt_j = jnp.asarray(ew[::-1, :].copy())
x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
CHAIN = 8

def build(rows, cols):
    cb = cols // LANES
    def k(ewl_ref, ewt_ref, left_ref, x_ref, right_ref, o_ref):
        ci = pl.program_id(1)
        n_ci = pl.num_programs(1)
        left = jnp.where(ci == 0, 0.0, left_ref[:, :])
        right = jnp.where(ci == n_ci - 1, 0.0, right_ref[:, :])
        xw = jnp.concatenate([left, x_ref[:, :], right], axis=1)
        for g in range(0, ws, 16):
            acc = float(wc[g]) * xw[:, LANES - n + g:LANES - n + g + cols]
            for t in range(g + 1, min(g + 16, ws)):
                acc = acc + float(wc[t]) * xw[:, LANES - n + t:LANES - n + t + cols]
            if g == 0: o_ref[:, :] = acc
            else: o_ref[:, :] = o_ref[:, :] + acc
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
    last128 = N // LANES - 1
    def call(v):
        return pl.pallas_call(
            k, grid=(B // rows, N // cols),
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
        )(ewl_j, ewt_j, v, v, v)
    return call

for rows, cols in [(32, 2048), (64, 2048), (32, 4096)]:
    call = build(rows, cols)
    def chain(v, call=call):
        y = call(v)
        for _ in range(CHAIN - 1):
            y = call(y)
        return y
    try:
        secs = bench(jax.jit(chain), x, iters=5)
        y = np.asarray(jax.jit(call)(x))[:4]
        want = np.asarray(f.apply(x[:4], method="xla"))
        print(f"1d_const r{rows} c{cols}  {B*N/(secs/CHAIN)/1e9:8.2f} Gs/s/call  err {np.abs(y-want).max():.2e}", flush=True)
    except Exception as e:
        print(f"1d_const r{rows} c{cols} FAILED {type(e).__name__} {str(e)[:100]}", flush=True)

# SMEM MXU banded chained reference at same protocol
from savgol_tpu.ops import pallas_conv as pc
def chainM(v):
    y = pc.savgol_polynomial_pallas_mxu(v, f.center_weights, f.edge_weights, n, f.dt_inv)
    for _ in range(CHAIN - 1):
        y = pc.savgol_polynomial_pallas_mxu(y, f.center_weights, f.edge_weights, n, f.dt_inv)
    return y
secs = bench(jax.jit(chainM), x, iters=5)
print(f"1d_mxu chained        {B*N/(secs/CHAIN)/1e9:8.2f} Gs/s/call", flush=True)
