"""Oracle comparison tool — the rebuild's equivalent of the reference's
MATLAB validation script (`tool for matlab comparisons/savgolComparison.m`,
which compares against MATLAB smoothdata(...,'sgolay')).

Compares, on a noisy test signal and a config sweep:
  * savgol_tpu (JAX path, f32 and f64)
  * scipy.signal.savgol_filter (MATLAB sgolayfilt-equivalent oracle)
  * the native C++ host runtime
  * the compiled reference C library (if buildable)

Prints a per-config max-abs-difference table; optionally saves a plot.

    python benchmarks/compare_oracles.py [--plot out.png]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None)
    ap.add_argument("--n-samples", type=int, default=350)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import savgol_tpu as sg

    if jax.default_backend() == "cpu":
        try:
            jax.config.update("jax_enable_x64", True)
        except Exception:
            pass

    rng = np.random.default_rng(42)
    t = np.linspace(0, 6 * np.pi, args.n_samples)
    x = (np.sin(t) + 0.15 * rng.standard_normal(t.size)).astype(np.float32)

    try:
        from scipy.signal import savgol_filter
        have_scipy = True
    except ImportError:
        have_scipy = False

    try:
        from savgol_tpu.native import HostSavgol1D
        have_native = True
    except ImportError:
        have_native = False

    configs = [(12, 4, 0), (5, 3, 0), (8, 3, 1), (12, 4, 2)]
    print(f"{'config':>14} | {'vs scipy':>12} | {'vs native C++':>14}")
    print("-" * 48)
    curves = {}
    for (n, m, d) in configs:
        cfg = sg.SavgolConfig(n, m, d)
        flt = sg.Savgol1D.create(cfg, dtype=jnp.float32)
        ours = np.asarray(flt.apply(jnp.asarray(x)))
        curves[(n, m, d)] = ours
        col_scipy = "n/a"
        if have_scipy:
            ref = savgol_filter(x.astype(np.float64), 2 * n + 1, m, deriv=d,
                                mode="interp")
            col_scipy = f"{np.abs(ours - ref).max():.3e}"
        col_native = "n/a"
        if have_native:
            hv = HostSavgol1D(cfg).apply(x)
            col_native = f"{np.abs(ours - hv).max():.3e}"
        print(f"  n={n:2d} m={m} d={d} | {col_scipy:>12} | {col_native:>14}")

    # ---- coefficient accuracy vs the EXACT rational least-squares answer --
    # (the adjudicating oracle the fuzz suite uses: tests/test_weights.py).
    # scipy builds coefficients with f64 lstsq, which drifts at high
    # polyorder; the Gram three-term recurrence stays at f64 roundoff.
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    try:
        from test_weights import exact_weights
        from savgol_tpu.scipy_compat import savgol_coeffs as our_coeffs
        if have_scipy:
            from scipy.signal import savgol_coeffs as sp_coeffs
        print()
        print("coefficient max-abs-err vs exact rational LS "
              "(pos: c=center, 0=leading edge row)")
        print(f"{'config':>22} | {'savgol_tpu':>12} | {'scipy':>12}")
        print("-" * 52)
        coeff_cfgs = [(5, 2, 0), (25, 4, 2), (21, 10, 0), (25, 10, 0),
                      (37, 12, 0), (37, 12, 5)]
        for (wl, po, d) in coeff_cfgs:
            n = wl // 2
            for pos, tag in ((None, "c"), (0, "0")):
                tt = 0 if pos is None else pos - n
                ex = exact_weights(n, po, d, tt)
                ours_c = np.asarray(our_coeffs(wl, po, deriv=d, pos=pos,
                                               use="dot"))
                e_ours = f"{np.abs(ours_c - ex).max():.3e}"
                e_sp = "n/a"
                if have_scipy:
                    try:
                        spc = sp_coeffs(wl, po, deriv=d, pos=pos, use="dot")
                        e_sp = f"{np.abs(spc - ex).max():.3e}"
                    except Exception as exc:     # scipy rejects some configs
                        e_sp = type(exc).__name__
                print(f"  wl={wl:2d} m={po:2d} d={d} pos={tag} |"
                      f" {e_ours:>12} | {e_sp:>12}")
    except ImportError:
        print("(exact-rational oracle unavailable outside the repo checkout)")

    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plot")
            return
        fig, (a, b) = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
        a.plot(t, x, lw=0.5, alpha=0.5, label="noisy")
        a.plot(t, curves[(12, 4, 0)], lw=1.5, label="savgol_tpu n=12 m=4")
        a.legend()
        a.set_title("Smoothing")
        if have_scipy:
            ref = savgol_filter(x.astype(np.float64), 25, 4, mode="interp")
            b.plot(t, curves[(12, 4, 0)] - ref, lw=0.8)
            b.set_title("difference vs scipy sgolayfilt (f64)")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"plot saved: {args.plot}")


if __name__ == "__main__":
    main()
