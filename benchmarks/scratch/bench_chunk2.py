import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu import stream as fstream

rng = np.random.default_rng(0)
def bench(fn, *a, iters=10, warmup=3):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

n = 12
flt = sg.Savgol1D.create(sg.SavgolConfig(n, 4), dtype=jnp.float32)
for C, S in [(8192, 64), (65536, 32)]:
    chunks = jnp.asarray(rng.standard_normal((S, C)), dtype=jnp.float32)
    @jax.jit
    def run_chunks(chs):
        def body(st, ch):
            st, o, c = fstream.stream_process_chunk(
                st, ch, flt.center_weights, flt.edge_weights, flt.dt_inv)
            return st, o
        st, outs = jax.lax.scan(body, fstream.chunk_init(n, jnp.float32), chs)
        return outs
    secs = bench(run_chunks, chunks)
    print(f"chunked C={C:6d}  {S*C/secs/1e6:9.2f} Msamples/s", flush=True)
    # correctness vs batch
    small = chunks[:4, :1024]
    st = fstream.chunk_init(n, jnp.float32)
    got = []
    step = jax.jit(lambda st, ch: fstream.stream_process_chunk(
        st, ch, flt.center_weights, flt.edge_weights, flt.dt_inv))
    for i in range(4):
        st, o, c = step(st, small[i])
        got.append(np.asarray(o)[:int(c)])
    got = np.concatenate(got)
    flat = small.reshape(-1)
    want = np.asarray(jax.jit(flt.apply)(flat))[:flat.size - n]
    print(f"  err vs batch {np.abs(got-want).max():.2e} (count {got.size}=={flat.size-n})", flush=True)
