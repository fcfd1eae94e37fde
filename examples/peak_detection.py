"""Demo: smoothing + derivative-based peak detection.

Port of the reference's benchmark/demo program
(/root/reference/test/iterative/test_savgol_main.c): smooth a bumpy noisy
signal, locate its peak via the zero crossing of the Savitzky-Golay first
derivative (:191-207), and report throughput (:136-155) — here on whatever
backend JAX selects (TPU if available).

    python examples/peak_detection.py
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

    rng = np.random.default_rng(7)
    # A bumpy measurement-like trace: gaussian bump + drift + noise
    N = 360
    t = np.arange(N, dtype=np.float32)
    clean = 40 * np.exp(-0.5 * ((t - 180) / 35.0) ** 2) + 0.02 * t
    noisy = (clean + 1.5 * rng.standard_normal(N)).astype(np.float32)

    smooth_f = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=jnp.float32)
    deriv_f = sg.Savgol1D.create(sg.deriv1(6, 3), dtype=jnp.float32)

    x = jnp.asarray(noisy)
    smoothed = np.asarray(smooth_f.apply(x))
    slope = np.asarray(deriv_f.apply(x))

    # Peak = first + -> - zero crossing of the smoothed derivative
    sign = np.sign(slope)
    crossings = np.where((sign[:-1] > 0) & (sign[1:] <= 0))[0]
    peak = int(crossings[np.argmax(smoothed[crossings])])
    print(f"true peak ~180, detected peak at index {peak} "
          f"(value {smoothed[peak]:.2f})")

    # RMS improvement
    rms_before = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    rms_after = float(np.sqrt(np.mean((smoothed - clean) ** 2)))
    print(f"noise RMS: {rms_before:.3f} -> {rms_after:.3f}")

    # Throughput, reference-style (10k iterations over the 360-pt signal —
    # dominated by dispatch at this size; batch the iterations instead,
    # which is what a TPU user would do)
    iters = 10_000
    big = jnp.asarray(np.tile(noisy, (iters, 1)))
    fn = jax.jit(smooth_f.apply)
    fn(big).block_until_ready()
    t0 = time.perf_counter()
    out = fn(big)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"throughput: {iters * N / dt / 1e6:.1f} Msamples/s "
          f"({iters} x {N} samples, {jax.default_backend()})")

    # The host C++ engine serves the reference's own small-signal/embedded
    # scenario (single trace, low latency) without device dispatch:
    try:
        from savgol_tpu.native import HostSavgol1D
        hf = HostSavgol1D(sg.SavgolConfig(6, 3))
        hf.apply(noisy)
        t0 = time.perf_counter()
        for _ in range(2000):
            hf.apply(noisy)
        dtn = time.perf_counter() - t0
        print(f"native host engine: {2000 * N / dtn / 1e6:.1f} Msamples/s "
              f"(single {N}-pt trace per call)")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
