"""Demo: multi-chip scaling on a device mesh (runs anywhere).

The reference is single-process (SURVEY.md §2: no parallelism). The
TPU-native scaling story is sharding over a ``jax.sharding.Mesh``:

  * data parallel over the batch axis (zero communication),
  * sequence parallel over the sample axis — overlap-save with a
    half_window halo exchanged between ring neighbors (2 ppermute sends,
    or the hand-rolled Pallas remote-DMA ring with ``halo="rdma"``),
  * 2D images row-sharded the same way,
  * gradients flow back through the collectives, so a denoising training
    step jits end-to-end over the mesh.

Without 8 real chips the demo self-provisions 8 virtual CPU devices
(exactly how tests/conftest.py and the driver's dryrun validate the
multi-chip path):

    python examples/multichip_mesh.py
"""

import os
import sys

if __name__ == "__main__" and os.environ.get("_SAVGOL_MESH_CHILD") != "1":
    # Virtual-device flags must land before JAX initializes; re-exec with
    # the CPU platform and 8 host devices. PYTHONPATH is APPENDED to keep
    # any site customization (never replaced).
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["_SAVGOL_MESH_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_NUM_CPU_DEVICES"] = "8"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = (here + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else here)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import savgol_tpu as sg
    from savgol_tpu.parallel.sharded import apply_sharded, make_mesh
    from savgol_tpu.parallel.sharded2d import apply2d_sharded

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    rng = np.random.default_rng(0)

    # --- dp x sp mesh: 2-way batch x 4-way sequence ----------------------
    mesh = make_mesh(("batch", "seq"), shape=(2, 4))
    flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4, 1), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 65536)), dtype=jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("batch", "seq")))

    y = jax.jit(lambda v: apply_sharded(
        v, flt.center_weights, flt.edge_weights, half_window=12, mesh=mesh,
        boundary=sg.BoundaryMode.POLYNOMIAL, dt_inv=flt.dt_inv,
        derivative=1))(x)
    y_single = flt.apply(x)
    err = float(jnp.abs(y - y_single).max())
    print(f"1D dp2 x sp4 overlap-save: shape {y.shape}, "
          f"max |sharded - single| = {err:.2e}")

    # --- PERIODIC rides the ring natively; rdma = Pallas remote-DMA halo -
    mesh_seq = make_mesh(("seq",), shape=(8,))
    xs = jnp.asarray(rng.standard_normal((4, 32768)), dtype=jnp.float32)
    kw = dict(half_window=12, mesh=mesh_seq, dt_inv=flt.dt_inv,
              derivative=1, boundary=sg.BoundaryMode.PERIODIC)
    y_pp = jax.jit(lambda v: apply_sharded(
        v, flt.center_weights, flt.edge_weights, halo="ppermute", **kw))(xs)
    y_rdma = jax.jit(lambda v: apply_sharded(
        v, flt.center_weights, flt.edge_weights, halo="rdma", **kw))(xs)
    same = bool(jnp.array_equal(y_pp, y_rdma))
    print(f"1D sp8 PERIODIC ring: ppermute == rdma halo bitwise: {same}")

    # --- 2D: rows sharded over the mesh, halo rows exchanged -------------
    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3, deriv_x=1),
                            dtype=jnp.float32)
    img = jnp.asarray(rng.standard_normal((512, 256)), dtype=jnp.float32)
    y2 = jax.jit(lambda v: apply2d_sharded(
        v, f2.weights, mesh=mesh_seq, boundary=sg.Boundary2D.REFLECT,
        scale=f2.scale))(img)
    y2_rdma = jax.jit(lambda v: apply2d_sharded(
        v, f2.weights, mesh=mesh_seq, boundary=sg.Boundary2D.REFLECT,
        scale=f2.scale, halo="rdma"))(img)
    err2 = float(jnp.abs(y2 - f2.apply(
        img, boundary=sg.Boundary2D.REFLECT)).max())
    same2 = bool(jnp.array_equal(y2, y2_rdma))
    print(f"2D row-sharded d/dx: max err vs single = {err2:.2e}, "
          f"rdma row halo bitwise equal: {same2}")

    # --- jitted training steps: gradient through the collectives ---------
    # Landweber-style deconvolution: recover v such that F(v) == clean,
    # starting from the noisy signal. lr = v.size/2 turns the mean-loss
    # gradient (2/N) F^T r into the classic v -= F^T r update (stable:
    # the smoothing filter's operator norm is <= 1).
    t_axis = jnp.arange(x.shape[-1], dtype=jnp.float32)
    clean = jnp.sin(t_axis / 512.0)[None, :] * jnp.ones((8, 1), jnp.float32)
    noisy = clean + 0.3 * jnp.asarray(
        rng.standard_normal(clean.shape), dtype=jnp.float32)
    clean = jax.device_put(clean, NamedSharding(mesh, P("batch", "seq")))
    noisy = jax.device_put(noisy, NamedSharding(mesh, P("batch", "seq")))
    smooth = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)

    @jax.jit
    def train_step(v, tgt):
        def loss_fn(inp):
            out = apply_sharded(
                inp, smooth.center_weights, smooth.edge_weights,
                half_window=12, mesh=mesh,
                boundary=sg.BoundaryMode.CONSTANT)
            return jnp.mean((out - tgt) ** 2)
        loss, grad = jax.value_and_grad(loss_fn)(v)
        return loss, v - (v.size / 2) * grad

    v = noisy
    losses = []
    for _ in range(5):
        loss, v = train_step(v, clean)
        losses.append(float(loss))
    print("training steps over the mesh (gradient rode the halo "
          "collectives): loss " + " -> ".join(f"{l:.5f}" for l in losses))


if __name__ == "__main__":
    main()
