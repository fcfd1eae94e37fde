import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import savgol_tpu as sg
from savgol_tpu.ops import pallas_conv as pc
from savgol_tpu.ops.apply2d import correlate2d_valid

rng = np.random.default_rng(0)
def bench(fn, *a, iters=8, warmup=2):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

fbig = sg.Savgol2D.create(sg.Savgol2DConfig(16, 16, 4), dtype=jnp.float32)
wb = fbig.weights
wbnp = np.asarray(wb)
small = jnp.asarray(rng.standard_normal((1, 300, 400)), dtype=jnp.float32)
wantb = np.asarray(correlate2d_valid(small, wb))
img = jnp.asarray(rng.standard_normal((4, 2080, 2080)), dtype=jnp.float32)
NPIX = 4 * 2048 * 2048

# default dispatch (routes to sep)
one = lambda v: pc.correlate2d_valid_pallas(v, wb)
got = np.asarray(jax.jit(one)(small))
print(f"default33 err {np.abs(got-wantb).max():.2e}", flush=True)
print(f"default33 wall {NPIX/bench(jax.jit(one), img)/1e9:7.2f} Gpix/s", flush=True)

# sep at cols 256
one = lambda v: pc.correlate2d_valid_pallas_sep(v, wbnp, cols=256)
try:
    print(f"sep33 c256 wall {NPIX/bench(jax.jit(one), img)/1e9:7.2f} Gpix/s", flush=True)
except Exception as e:
    print("sep33 c256 FAILED", str(e)[:100], flush=True)

# traced-weights (SMEM) wide stencil at cols 512 / 256
for c in (512, 256):
    try:
        fn = jax.jit(lambda v, w: pc.correlate2d_valid_pallas(v, w, cols=c))
        got = np.asarray(fn(small, wb))
        err = np.abs(got - wantb).max()
        secs = bench(fn, img, wb)
        print(f"smem33 c{c} wall {NPIX/secs/1e9:7.2f} Gpix/s err {err:.2e}", flush=True)
    except Exception as e:
        print(f"smem33 c{c} FAILED {str(e)[:90]}", flush=True)
