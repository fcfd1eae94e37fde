"""Demo: the high-throughput serving stack.

Shows the three throughput levers this framework adds beyond the
reference library's single-thread batch apply:

  1. the default exact path (fused 2-band banded-MXU Pallas kernel,
     ~30 Gsamples/s/chip at n=12),
  2. ``method="bf16"`` for tolerant workloads (~2x, documented <=5e-3
     relative contract, exact-twin gradients),
  3. multi-chip overlap-save sharding (``apply_sharded``) — run here on
     however many devices are visible (works on a virtual CPU mesh:
     JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python examples/throughput_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=10, warmup=2):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import savgol_tpu as sg

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    rng = np.random.default_rng(0)
    # SAVGOL_EXAMPLE_QUICK shrinks the workload for CI smoke runs — the
    # bf16 Pallas kernel runs INTERPRETED off-TPU, where the full size
    # takes minutes (rates are only meaningful on hardware anyway)
    quick = bool(os.environ.get("SAVGOL_EXAMPLE_QUICK"))
    B, N = (8, 16_384) if quick else (64, 262_144)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)

    # 1. default exact path — no flags needed
    fn = jax.jit(lambda v: flt.apply(v))
    secs = bench(fn, x)
    print(f"exact default : {B * N / secs / 1e9:6.2f} Gsamples/s")

    # 2. bf16 throughput mode (keep data bf16 end to end for full effect)
    xb = x.astype(jnp.bfloat16)
    fn16 = jax.jit(lambda v: flt.apply(v, method="bf16"))
    secs = bench(fn16, xb)
    err = float(jnp.max(jnp.abs(
        fn16(x[:4]).astype(jnp.float32) - fn(x[:4]))))
    print(f"bf16 mode     : {B * N / secs / 1e9:6.2f} Gsamples/s "
          f"(max abs err vs exact: {err:.1e})")

    # 3. multi-chip overlap-save (sequence axis sharded over all devices)
    ndev = len(jax.devices())
    if ndev > 1:
        from savgol_tpu.parallel.sharded import apply_sharded, make_mesh
        mesh = make_mesh(("batch", "seq"), shape=(1, ndev))
        fns = jax.jit(lambda v: apply_sharded(
            v, flt.center_weights, flt.edge_weights, half_window=12,
            mesh=mesh, dt_inv=flt.dt_inv))
        secs = bench(fns, x)
        parity = float(jnp.max(jnp.abs(fns(x[:4]) - fn(x[:4]))))
        print(f"sharded x{ndev}   : {B * N / secs / 1e9:6.2f} Gsamples/s "
              f"(matches single-device to {parity:.1e})")
    else:
        print("sharded       : 1 device visible — skipped "
              "(try XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "JAX_PLATFORMS=cpu)")


if __name__ == "__main__":
    main()
