"""Demo: 2D Savitzky-Golay smoothing + derivative fields on an image.

The reference's 2D convenience functions create and destroy a filter per
derivative (/root/reference/src/savgol2d.c:462-618); here the gradient and
Hessian come from stacked-stencil single passes, and the bf16 mode shows
the throughput option for tolerant imaging pipelines.

    python examples/image_derivatives.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import savgol_tpu as sg

    rng = np.random.default_rng(3)
    # synthetic "microscopy" frame: two gaussian blobs + gradient + noise
    H = W = 512
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (np.exp(-((xx - 160) ** 2 + (yy - 200) ** 2) / (2 * 40.0**2))
           + 0.7 * np.exp(-((xx - 360) ** 2 + (yy - 320) ** 2)
                          / (2 * 25.0**2))
           + 0.0005 * xx + 0.05 * rng.standard_normal((H, W)))
    img = jnp.asarray(img)

    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3))
    smooth = np.asarray(f2.apply(img))
    gx, gy = sg.savgol2d_gradient(img, 5, 5, 3)
    hxx, hxy, hyy = sg.savgol2d_hessian(img, 5, 5, 3)
    lap = np.asarray(sg.savgol2d_laplacian(img, 5, 5, 3))

    # blob centers: maxima of the SMOOTHED field where the Hessian says
    # "local max" (negative laplacian, positive determinant) — the noisy
    # raw argmax would jitter by several pixels
    det = (np.asarray(hxx) * np.asarray(hyy) - np.asarray(hxy) ** 2)
    for name, sl in (("blob A", np.s_[:, :256]), ("blob B", np.s_[:, 256:])):
        region = np.where((lap[sl] < 0) & (det[sl] > 0), smooth[sl], -np.inf)
        iy, ix = np.unravel_index(np.argmax(region), region.shape)
        x0 = 0 if sl[1].start is None else sl[1].start
        print(f"{name}: peak at ({ix + x0}, {iy})")
    print(f"removed-noise RMS: {np.std(np.asarray(img) - smooth):.4f} "
          f"(injected 0.05)")

    # throughput option for big batches of frames
    frames = jnp.asarray(rng.standard_normal((8, H, W)), dtype=jnp.float32)
    fn = jax.jit(lambda v: f2.apply(v))
    fn16 = jax.jit(lambda v: f2.apply(v, method="bf16"))
    for name, f, v in (("exact", fn, frames),
                       ("bf16 ", fn16, frames.astype(jnp.bfloat16))):
        out = f(v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(v)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 5
        print(f"{name}: {frames.size / t / 1e9:5.2f} Gpix/s "
              f"({jax.default_backend()})")


if __name__ == "__main__":
    main()
