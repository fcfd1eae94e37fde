"""Benchmark harness: the five BASELINE.json configs on real hardware.

Prints one JSON line per config; throughput figures use a chained
(8-deep, single-dispatch) protocol so they reflect on-device rates rather
than the dev tunnel's per-dispatch RTT. Run on the TPU host:

    python benchmarks/run_benchmarks.py [--configs 1,2,3,4,5] [--quick]

Configs (BASELINE.json):
  1. 1D batch smooth: 100k-sample noisy sine, n=12 m=4 d=0, polynomial
     boundary, with scipy sgolayfilt-parity check.
  2. Smoothed derivatives d=1/d=2 with time_step scaling across
     reflect/periodic/constant boundaries.
  3. Online streaming (lax.scan), fixed latency n, sweep n=1..32.
  4. 2D: 2048x2048 image, 11x11 window, order-3 fit.
  5. Batched multi-channel: 8192 channels x 1M samples (chunked to fit
     HBM), fused on-device weight-gen + conv, vmapped (n,m) sweep.
  6. Masked / nonuniform capability paths (beyond-reference) with their
     pipeline rooflines: masked 1D normal, masked 2D, nonuniform.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def _t(fn, *args, iters=10, warmup=2):
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


_CHAIN = 8


def _t_chain(one, x, iters=5, warmup=2):
    """Per-call time of ``one`` measured as a _CHAIN-deep composition
    inside ONE jitted dispatch. Through the dev-TPU tunnel each dispatch
    carries ~2-6 ms of RTT; chaining amortizes it so the number reflects
    on-device throughput (what a fused production pipeline sees). ``one``
    must map an array to a same-shaped array."""
    import jax

    def chain(v):
        y = one(v)
        for _ in range(_CHAIN - 1):
            y = one(y)
        return y

    return _t(jax.jit(chain), x, iters=iters, warmup=warmup) / _CHAIN


def _emit(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def bench_1(quick):
    import jax, jax.numpy as jnp
    import savgol_tpu as sg

    rng = np.random.default_rng(0)
    N = 100_000
    t = np.linspace(0, 4 * np.pi, N)
    x = (np.sin(t) + 0.1 * rng.standard_normal(N)).astype(np.float32)
    flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
    res = {}
    for path, kw in [("default", {}), ("xla", {"method": "xla"}),
                     ("pallas", {"method": "pallas"})]:
        secs = _t_chain(lambda v, kw=kw: flt.apply(v, **kw),
                        jnp.asarray(x)[None, :],
                        iters=3 if quick else 10)
        res[path] = N / secs / 1e9
    err = None
    try:
        from scipy.signal import savgol_filter
        ours = np.asarray(jax.jit(flt.apply)(jnp.asarray(x)))
        ref = savgol_filter(x.astype(np.float64), 25, 4, mode="interp")
        err = float(np.abs(ours - ref).max())
    except Exception:
        pass
    _emit("1_batch_smooth_100k", gsamples_s=res,
          max_abs_err_vs_sgolayfilt=err)


def bench_2(quick):
    import jax, jax.numpy as jnp
    import savgol_tpu as sg

    rng = np.random.default_rng(1)
    B, N = 64, 262_144
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    out = {}
    for d in (1, 2):
        for bm in (sg.BoundaryMode.REFLECT, sg.BoundaryMode.PERIODIC,
                   sg.BoundaryMode.CONSTANT):
            flt = sg.Savgol1D.create(
                sg.SavgolConfig(12, 4, d, time_step=0.01, boundary=bm),
                dtype=jnp.float32)
            secs = _t_chain(lambda v, flt=flt: flt.apply(v), x,
                            iters=2 if quick else 5)
            out[f"d{d}_{bm.value}"] = round(B * N / secs / 1e9, 3)
    _emit("2_derivatives_boundaries", gsamples_s=out)


def bench_3(quick):
    import jax, jax.numpy as jnp
    import savgol_tpu as sg

    rng = np.random.default_rng(2)
    T = 16_384 if quick else 65_536
    x = jnp.asarray(rng.standard_normal(T), dtype=jnp.float32)
    out = {}
    ns = (1, 4, 12, 32) if quick else (1, 2, 4, 8, 12, 16, 24, 32)
    for n in ns:
        m = min(3, 2 * n)
        flt = sg.Savgol1D.create(sg.SavgolConfig(n, m), dtype=jnp.float32)

        def fn(v, flt=flt, n=n):
            return sg.stream_apply(v, flt.center_weights,
                                   flt.edge_weights, half_window=n,
                                   dt_inv=flt.dt_inv)

        secs = _t(jax.jit(fn), x, iters=3 if quick else 10)
        out[f"n{n}"] = round(T / secs / 1e6, 3)
    _emit("3_streaming_scan", msamples_s=out, latency="half_window",
          note="sequential scan is latency-bound by design; chunked mode "
               "below is the throughput route")

    # chunked streaming: batch-path throughput at chunk-bounded latency
    from savgol_tpu import stream as fstream
    n = 12
    flt = sg.Savgol1D.create(sg.SavgolConfig(n, 4), dtype=jnp.float32)
    C = 8192
    chunks = jnp.asarray(
        rng.standard_normal((64, C)), dtype=jnp.float32)

    @jax.jit
    def run_chunks(chs):
        def body(st, ch):
            st, o, c = fstream.stream_process_chunk(
                st, ch, flt.center_weights, flt.edge_weights, flt.dt_inv)
            return st, o
        st, outs = jax.lax.scan(body, fstream.chunk_init(n, jnp.float32),
                                chs)
        return outs

    secs = _t(run_chunks, chunks, iters=3 if quick else 10)

    # correctness gate: concatenated chunk outputs must equal the batch
    # apply's first (total - n) outputs (the stream's emission schedule:
    # lead edge + all centers; the trailing n arrive only at flush)
    small = jnp.asarray(rng.standard_normal((4, 1024)), dtype=jnp.float32)
    step = jax.jit(lambda st, ch: fstream.stream_process_chunk(
        st, ch, flt.center_weights, flt.edge_weights, flt.dt_inv))
    st = fstream.chunk_init(n, jnp.float32)
    got = []
    for i in range(small.shape[0]):
        st, o, c = step(st, small[i])
        got.append(np.asarray(o)[:int(c)])
    got = np.concatenate(got)
    flat = small.reshape(-1)
    want = np.asarray(jax.jit(flt.apply)(flat))[:flat.size - n]
    chunk_err = float(np.abs(got - want).max())
    assert got.size == flat.size - n, (got.size, flat.size - n)
    assert chunk_err <= 1e-5, f"chunked stream diverges: {chunk_err:.3e}"

    _emit("3b_streaming_chunked",
          msamples_s=round(64 * C / secs / 1e6, 3),
          chunk_size=C, latency_samples=C + n,
          max_abs_err_vs_batch=chunk_err)


def bench_4(quick):
    import jax, jax.numpy as jnp
    import savgol_tpu as sg
    from savgol_tpu.ops import pallas_conv as pc

    rng = np.random.default_rng(3)
    B = 2 if quick else 4
    img = jnp.asarray(rng.standard_normal((B, 2048, 2048)),
                      dtype=jnp.float32)
    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
    res = {}
    res["default_api"] = (B * 2048 * 2048 / _t_chain(
        lambda v: f2.apply(v, boundary=sg.Boundary2D.CONSTANT), img,
        iters=2 if quick else 5) / 1e9)
    res["xla"] = (B * 2048 * 2048 / _t_chain(
        lambda v: f2.apply(v, boundary=sg.Boundary2D.CONSTANT,
                           method="xla"), img, iters=2 if quick else 3) / 1e9)
    import numpy as _np
    w_np = _np.asarray(f2.weights)
    imgp = jnp.asarray(rng.standard_normal((B, 2058, 2058)),
                       dtype=jnp.float32)

    def valid_same(one):
        # keep shapes fixed across the chain by re-padding the valid output
        def wrapped(v):
            y = one(v)
            return jnp.pad(y, ((0, 0), (5, 5), (5, 5)))
        return wrapped

    res["pallas_valid"] = (B * 2048 * 2048 / _t_chain(
        valid_same(lambda v: pc.correlate2d_valid_pallas(v, f2.weights)),
        imgp, iters=2 if quick else 5) / 1e9)
    res["sep_valid"] = (B * 2048 * 2048 / _t_chain(
        valid_same(lambda v: pc.correlate2d_valid_pallas_sep(v, w_np)),
        imgp, iters=2 if quick else 5) / 1e9)
    # speed-of-light fraction of the exact row-banded model (the default
    # path's kernel at this window; utils/roofline.py)
    from savgol_tpu.utils.roofline import speed_of_light_2d
    rl = speed_of_light_2d(11, shape=(B, 2048, 2048))
    _emit("4_2d_2048_11x11_order3",
          gpix_s={k: round(v, 3) for k, v in res.items()},
          roofline_pct_default=round(
              100 * res["default_api"] * 1e9 / rl.ceiling_per_s, 1),
          roofline_ceiling_gpix_s=round(rl.ceiling_per_s / 1e9, 2))


def bench_5(quick):
    import jax, jax.numpy as jnp
    import savgol_tpu as sg
    from savgol_tpu.ops.sweep import savgol_apply_sweep

    rng = np.random.default_rng(4)
    # 8192 channels x 1M samples = 32 GB f32 — stream it through the chip
    # in HBM-sized chunks; throughput is what matters.
    chan_chunk = 64 if quick else 256
    N = 1_048_576
    total_channels = 512 if quick else 8192
    x = jnp.asarray(rng.standard_normal((chan_chunk, N)), dtype=jnp.float32)
    flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)
    secs_chunk = _t_chain(lambda v: flt.apply(v), x,
                          iters=2 if quick else 5)
    n_chunks = total_channels // chan_chunk
    total_s = secs_chunk * n_chunks
    gsps = total_channels * N / total_s / 1e9

    # vmapped (n, m) sweep with fused on-device weight gen
    xs = jnp.asarray(rng.standard_normal(N // 8), dtype=jnp.float32)
    ns = jnp.asarray([4, 8, 12, 16, 24, 32])
    ms = jnp.asarray([2, 3, 4, 4, 5, 6])

    def sweep_one(v):
        y = savgol_apply_sweep(v, ns, ms)
        return y.sum(axis=0) * 1e-3 + v      # same shape for chaining

    secs_sw = _t_chain(sweep_one, xs, iters=2 if quick else 5)
    from savgol_tpu.utils.roofline import speed_of_light_1d
    rl = speed_of_light_1d((chan_chunk, N))
    _emit("5_multichannel_8192x1M", gsamples_s=round(gsps, 3),
          chunk=[chan_chunk, N], chunks=n_chunks,
          roofline_pct=round(100 * gsps * 1e9 / rl.ceiling_per_s, 1),
          roofline_ceiling_gs_s=round(rl.ceiling_per_s / 1e9, 2),
          sweep_6cfg_gsamples_s=round(6 * xs.size / secs_sw / 1e9, 3))


def bench_6(quick):
    """Masked / nonuniform capability paths (beyond-reference), each with
    its pipeline roofline (utils/roofline.py) — VERDICT r03 #2."""
    import jax, jax.numpy as jnp

    from savgol_tpu.ops.masked import (savgol_apply_masked,
                                       savgol2d_apply_masked)
    from savgol_tpu.ops.nonuniform import savgol_apply_nonuniform
    from savgol_tpu.utils.roofline import (speed_of_light_masked_1d,
                                           speed_of_light_masked_2d,
                                           speed_of_light_nonuniform)

    rng = np.random.default_rng(6)
    out = {}

    B, N = (16, 65_536) if quick else (64, 131_072)
    xm_np = rng.standard_normal((B, N)).astype(np.float32)
    xm_np[rng.random(xm_np.shape) < 0.2] = np.nan
    xm = jnp.asarray(xm_np)
    mk = jnp.asarray(np.isfinite(xm_np))
    secs = _t_chain(lambda v: savgol_apply_masked(
        v, half_window=12, poly_order=4, mask=mk, fill=0.0), xm,
        iters=2 if quick else 5)
    rl = speed_of_light_masked_1d(4, shape=(B, N))
    out["masked1d_normal"] = dict(
        gsamples_s=round(B * N / secs / 1e9, 3),
        roofline_gs_s=round(rl.ceiling_per_s / 1e9, 2),
        roofline_pct=round(100 * (B * N / secs) / rl.ceiling_per_s, 1),
        bound=rl.bound)

    R = 512 if quick else 1024
    im_np = rng.standard_normal((R, R)).astype(np.float32)
    im_np[rng.random(im_np.shape) < 0.2] = np.nan
    imj = jnp.asarray(im_np)
    mk2 = jnp.asarray(np.isfinite(im_np))
    secs = _t_chain(lambda v: savgol2d_apply_masked(
        v, half_window_x=5, half_window_y=5, poly_order=3, mask=mk2,
        fill=0.0), imj, iters=2 if quick else 5)
    rl = speed_of_light_masked_2d(11, 11, 3, shape=(R, R))
    out["masked2d_o3"] = dict(
        mpix_s=round(R * R / secs / 1e6, 1),
        roofline_mpix_s=round(rl.ceiling_per_s / 1e6, 1),
        roofline_pct=round(100 * (R * R / secs) / rl.ceiling_per_s, 1),
        bound=rl.bound)

    Bn = 2 if quick else 8
    tn = jnp.asarray(np.cumsum(rng.random((Bn, N)) + 0.5, axis=-1),
                     dtype=jnp.float32)
    xn = jnp.asarray(rng.standard_normal((Bn, N)).astype(np.float32))
    secs = _t_chain(lambda v: savgol_apply_nonuniform(
        v, tn, half_window=12, poly_order=4, fill=0.0), xn,
        iters=2 if quick else 5)
    rl = speed_of_light_nonuniform(12, 4, shape=(Bn, N))
    # the fused dd kernel is VPU-bound; the model publishes only the HBM
    # traffic lower bound (utils/roofline.py) — label the pct accordingly
    out["nonuniform"] = dict(
        gsamples_s=round(Bn * N / secs / 1e9, 3),
        hbm_traffic_bound_gs_s=round(rl.ceiling_per_s / 1e9, 3),
        traffic_pct=round(100 * (Bn * N / secs) / rl.ceiling_per_s, 1),
        bound=rl.bound)

    _emit("6_masked_nonuniform", **out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    import jax
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    table = {"1": bench_1, "2": bench_2, "3": bench_3, "4": bench_4,
             "5": bench_5, "6": bench_6}
    for c in args.configs.split(","):
        table[c.strip()](args.quick)


if __name__ == "__main__":
    main()
