"""Benchmark: prints the headline metric as a compact FINAL JSON line.

Output protocol: the full record (all extras) is printed first; the LAST
stdout line is a compact (<1.5 kB) JSON object with the headline metric
and the load-bearing extras. The driver captures only a 2000-char tail of
the run's output, so the parseable line must come last and stay small
(BENCH_r03.json lost its headline to this — "parsed": null).

Delivery guarantees (BENCH_r04 was killed by the driver at ~1100 s with
rc 124 and published NOTHING although the headline was measured by
+117 s — never again):

* the internal deadline defaults to 850 s, safely inside the observed
  ~1100 s driver kill; per-stage guards skip optional extras near it;
* the record is built INCREMENTALLY in a module global and a watchdog
  thread + SIGTERM/SIGINT/SIGALRM handlers flush whatever has been
  measured the moment the deadline hits or a kill arrives — a partial
  record with the headline beats a dead silent process (the flush path
  uses os._exit so no further output can displace the compact line);
* chained k-difference metrics retry a failed k-scaling ONCE (time
  permitting) and then fall back to the labeled wall-clock number
  (``extras.protocols[metric] == "wall"``) instead of skipping.

Headline: batched 1D Savitzky-Golay throughput (half_window=12,
poly_order=4, POLYNOMIAL boundary, f32) in Gsamples/s on one chip — the
BASELINE.json north-star config, measured on the DEFAULT code path
(``Savgol1D.apply`` with no flags; method="auto" resolves to the fastest
hardware path). ``vs_baseline`` is the ratio against the 5 Gsamples/s/chip
target (the reference publishes no absolute numbers; BASELINE.md).

Correctness gate: the default (Pallas/MXU) output is compared against the
XLA HIGHEST-precision path on the same data ON HARDWARE and the max abs
error is emitted as ``max_abs_err_default_vs_xla`` — a miscompiled kernel
cannot post a fast headline silently (CPU tests run the kernels in
interpreter mode only).

Extras carried in the same JSON object: explicitly-forced per-path
timings, 2D throughput (2048x2048, 11x11 window, order 3) in Gpix/s with
its own parity gate, masked/nonuniform/streaming rates, the native host
head-to-head (run CONCURRENTLY with the chained TPU stages — it is a
separate CPU process), and accuracy vs a scipy f64 oracle.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()
# Must bind BEFORE the driver's kill (~1100-1200 s observed in r4). The
# watchdog below flushes the partial record at this deadline even if the
# main thread is wedged inside a tunnel compile.
_DEADLINE_S = float(os.environ.get("SAVGOL_BENCH_DEADLINE_S", "850"))

# reuse Mosaic/XLA compiles across runs (first Pallas compile through the
# remote tunnel is ~3 min; cached it is ~1 s)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _note(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _time_left(need_s: float) -> bool:
    return (time.perf_counter() - _T0) + need_s < _DEADLINE_S


# ---------------------------------------------------------------------------
# Incremental result record + guaranteed emission
# ---------------------------------------------------------------------------

RESULT = {
    "metric": "1d_batch_throughput_n12_m4_default_path",
    "value": None,
    "unit": "Gsamples/s",
    "vs_baseline": None,
    "extras": {
        "hardware_parity_gates": {},
        "protocols": {},        # metric -> "wall" when chained fell back
        "path_errors": {},
    },
}
_EX = RESULT["extras"]
_EMIT_LOCK = threading.Lock()
_EMITTED = False
_FAILED = False   # a parity-gate assert fired: suppress the flush


def _emit(code: int | None = 0, reason: str = "") -> None:
    """Print the full record + the compact last line EXACTLY once and
    (unless code is None) hard-exit so nothing can displace the line."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED or _FAILED:
            return
        _EMITTED = True
    if reason:
        _EX["early_exit"] = reason
        _note(f"flushing record: {reason}")
    print(json.dumps(RESULT), flush=True)
    print(_compact_line(RESULT), flush=True)
    if code is not None:
        os._exit(code)


def _watchdog() -> None:
    """Flush the partial record at the deadline even if the main thread is
    blocked in a C call (tunnel compile) where signal handlers can't run."""
    while True:
        time.sleep(2.0)
        if _EMITTED or _FAILED:
            return
        if time.perf_counter() - _T0 > _DEADLINE_S:
            _emit(0, f"internal deadline {_DEADLINE_S:.0f}s — partial record")


def _on_signal(signum, frame):  # pragma: no cover - signal path
    _emit(0, f"signal {signum} — partial record")


def _install_guards() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except (ValueError, OSError):
            pass
    # belt and braces behind the watchdog: SIGALRM interrupts pure-Python
    # loops at deadline+30 even if the watchdog thread died
    try:
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(_DEADLINE_S) + 30)
    except (ValueError, OSError, AttributeError):
        pass


# ---------------------------------------------------------------------------
# Timing protocols
# ---------------------------------------------------------------------------

def _bench(fn, *args, iters=20, warmup=3):
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


def _dev_normal(seed: int, shape, dtype=None):
    """Standard-normal bench data generated ON DEVICE. Uploading numpy
    arrays with jnp.asarray rides the dev tunnel's H2D path, which under
    degradation measured ~0.7 MB/s — the 512 MB headline input alone ate
    600-770 s of the 850 s budget in three r5 runs. jax.random costs
    milliseconds and zero transfer."""
    import jax
    import jax.numpy as jnp
    x = jax.random.normal(jax.random.PRNGKey(seed), shape,
                          dtype or jnp.float32)
    return jax.block_until_ready(x)


def _dev_holes(seed: int, shape, p: float):
    """On-device Bernoulli(p) hole mask (True = missing)."""
    import jax
    u = jax.random.uniform(jax.random.PRNGKey(seed), shape)
    return jax.block_until_ready(u < p)


def _bench_chained(fn, x, *, key, iters=5, k=2, feedback_scale=1e-3):
    """On-device per-step seconds via the chained k-difference protocol
    (benchmarks/chainlib.py — one implementation, one RATIO_BAND).

    Policy on a k-scaling failure: retry ONCE at 2k if the deadline
    allows, then FALL BACK to the wall-clock rate of the un-chained call,
    recording ``extras.protocols[key] = "wall"`` so the number is labeled
    rather than silently absent (r4 skipped the masked metric after
    burning 300 s on retries). Returns per-step seconds or None only if
    even the wall fallback failed."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
        __file__)), "benchmarks"))
    from chainlib import RATIO_BAND, bench_chain

    for attempt, kk in enumerate((k, 2 * k)):
        if attempt and not _time_left(90):
            _note(f"{key}: no time for k={kk} retry — wall fallback")
            break
        per_step, ratio, _ = bench_chain(fn, x, iters=iters, k=kk,
                                         feedback_scale=feedback_scale,
                                         return_info=True)
        if RATIO_BAND[0] <= ratio <= RATIO_BAND[1]:
            _EX["protocols"].setdefault(key, "chained")
            return per_step
        _note(f"{key}: chained k-ratio {ratio:.2f} out of band at k={kk}")
    try:
        import jax
        per_step = _bench(jax.jit(fn), x, iters=5, warmup=2)
        _EX["protocols"][key] = "wall"
        _note(f"{key}: published WALL fallback")
        return per_step
    except Exception as e:
        _EX["path_errors"][key] = f"{type(e).__name__}: {e}"[:200]
        return None


from contextlib import contextmanager


@contextmanager
def _row(key: str):
    """One optional metric row: a transient failure (tunnel compile
    hiccup, OOM on a capability shape) records a path_error and the run
    CONTINUES — one flaky compile must not kill the remaining rows.
    Parity-gate AssertionErrors stay fatal."""
    try:
        yield
    except AssertionError:
        raise
    except Exception as e:
        _EX["path_errors"][key] = f"{type(e).__name__}: {e}"[:200]
        _note(f"{key}: row failed — continuing ({type(e).__name__})")


def _require_backend(timeout_s: float = 600.0):
    """Fail FAST (rc 3) if the device backend cannot initialize.

    During tunnel outages ``jax.devices()`` hangs indefinitely; better an
    explicit error than a silent hang the driver has to kill (and better
    no JSON line than a bogus zero-throughput one)."""
    import jax

    devs = []

    def probe():
        devs.extend(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive() or not devs:
        _note(f"FATAL: backend failed to initialize within {timeout_s:.0f}s "
              "(tunnel outage?) — emitting the CPU-only native fallback "
              "metric and exiting 3")
        # Emit an honest CPU-only metric rather than nothing: the native
        # host head-to-head needs no device. The metric NAME/UNIT make
        # clear this is not the TPU headline (see BENCH_r02 for that).
        try:
            import subprocess
            proc = subprocess.run(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "benchmarks", "bench_native.py")],
                capture_output=True, text=True, timeout=360)
            if proc.returncode == 0:
                nat = json.loads(proc.stdout.strip().splitlines()[-1])
                nat["vs_baseline"] = None
                nat["extras"]["tpu_unavailable"] = True
                nat["extras"]["note"] = (
                    "TPU backend did not initialize (tunnel outage); this "
                    "line is the host-CPU native-engine head-to-head only. "
                    "TPU metrics: see the previous round's BENCH record.")
                print(json.dumps(nat))
                print(_compact_line(nat))
        except Exception as e:
            _note(f"native fallback failed too: {type(e).__name__}: {e}")
        os._exit(3)
    return devs


def _start_native_bench():
    """Launch the native host head-to-head as a CONCURRENT subprocess.

    It is pure CPU (no tunnel) and ~100-150 s; overlapping it with the
    chained TPU stages keeps it clear of the deadline (in r4 it was
    scheduled last and the driver's kill ate it). Launched only after the
    wall-clock headline metrics are done so it cannot inflate them; the
    chained metrics that run alongside cancel dispatch overhead by
    construction."""
    import subprocess
    try:
        return subprocess.Popen(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "benchmarks", "bench_native.py")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    except Exception as e:
        _EX["path_errors"]["native_host"] = f"{type(e).__name__}: {e}"[:200]
        return None


def _collect_native_bench(proc) -> None:
    if proc is None:
        return
    budget = max(5.0, _DEADLINE_S - (time.perf_counter() - _T0) - 10.0)
    try:
        out, err = proc.communicate(timeout=budget)
        if proc.returncode == 0:
            nat = json.loads(out.strip().splitlines()[-1])
            _EX["native_host_vs_reference_geomean_speedup"] = nat["value"]
            _EX["native_host_vs_reference_geomean_speedup_2d"] = (
                nat["extras"]["geomean_speedup_2d"])
            _EX["native_host_rows"] = nat["extras"]["rows"]
            _EX["native_host_rows_2d"] = nat["extras"]["rows_2d"]
        else:
            _EX["path_errors"]["native_host"] = err[-200:]
    except Exception as e:
        try:
            proc.kill()
        except Exception:
            pass
        _EX["path_errors"]["native_host"] = f"{type(e).__name__}: {e}"[:200]


# ---------------------------------------------------------------------------
# Main
# ---------------------------------------------------------------------------

def main():
    global _FAILED
    _install_guards()
    _require_backend()
    try:
        _main_impl()
    except AssertionError:
        # a parity gate tripped: DO NOT flush a record that a later
        # reader would take as a clean bench
        _FAILED = True
        raise
    except BaseException as e:
        # infrastructure crash (tunnel compile hiccup, OOM, ...): the
        # measurements taken BEFORE it are real — publish the partial
        # record, labeled, with a nonzero rc (a r5 dry run died on a
        # transient remote-compile error AFTER the headline and gates
        # were in hand and published nothing)
        import traceback
        traceback.print_exc()
        _emit(1, f"crashed: {type(e).__name__}: {e}"[:200])
        raise  # unreachable (emit hard-exits), for readers
    _emit(0)


def _main_impl():
    import jax
    import jax.numpy as jnp

    import savgol_tpu as sg

    rng = np.random.default_rng(0)
    _EX["device"] = str(jax.devices()[0])

    # ---- headline: batched 1D, n=12, m=4, DEFAULT path -------------------
    B, N = 128, 1_048_576
    _EX["batch"], _EX["samples"] = B, N
    x = _dev_normal(0, (B, N))
    flt = sg.Savgol1D.create(sg.SavgolConfig(12, 4), dtype=jnp.float32)

    candidates = {}
    _EX["candidates_s"] = candidates

    _note(f"1D candidates on {jax.devices()[0]}")
    t_stage = time.perf_counter()
    fn_default = jax.jit(lambda v: flt.apply(v))      # method="auto"
    candidates["default"] = round(_bench(fn_default, x), 6)

    secs = candidates["default"]
    gsps = B * N / secs / 1e9
    RESULT["value"] = round(gsps, 3)
    RESULT["vs_baseline"] = round(gsps / 5.0, 3)

    # The shared chip sometimes serves multi-second dispatches under
    # contention (observed r5: a warm-cache candidates stage ate 630 s and
    # starved every later stage). When the headline path alone burned
    # >90 s, shrink the remaining DIAGNOSTIC timings so the chained
    # metrics and parity gates still run inside the deadline.
    slow_chip = time.perf_counter() - t_stage > 90.0
    diag_iters = 4 if slow_chip else 20
    if slow_chip:
        _note(f"slow chip ({time.perf_counter() - t_stage:.0f}s for the "
              f"headline path) — diagnostic timings at iters={diag_iters}")

    fn_xla = jax.jit(lambda v: flt.apply(v, method="xla"))
    candidates["xla"] = round(_bench(fn_xla, x, iters=diag_iters), 6)

    # ---- on-hardware parity gate: default path vs XLA HIGHEST ------------
    # Run IMMEDIATELY after the headline so an early kill still carries the
    # correctness evidence. (Same data, same device — catches Mosaic
    # lowering divergences that interpreter-mode CPU tests cannot see.)
    # 64 rows keeps the gate on the SAME banded-MXU kernel as the headline.
    xg = x[:64]
    y_default = np.asarray(fn_default(xg))
    y_xla = np.asarray(fn_xla(xg))
    err_gate = float(np.abs(y_default - y_xla).max())
    scale = float(np.abs(y_xla).max())
    assert err_gate <= 1e-5 * max(1.0, scale), (
        f"default-path output diverges from XLA HIGHEST on hardware: "
        f"max abs err {err_gate:.3e} (scale {scale:.3e})")
    _EX["max_abs_err_default_vs_xla"] = err_gate

    for name, kw in (("pallas", dict(method="pallas")),
                     ("mxu", dict(method="mxu"))):
        if slow_chip and not _time_left(500):
            break                         # diagnostics only — keep budget
        try:
            fn_c = jax.jit(lambda v, kw=kw: flt.apply(v, **kw))
            candidates[name] = round(_bench(fn_c, x, iters=diag_iters), 6)
        except Exception as e:            # surfaced in the JSON, not hidden
            _EX["path_errors"][name] = f"{type(e).__name__}: {e}"[:200]

    # bf16 throughput mode: bf16 in/out through the single-pass banded-MXU
    # kernel — its own documented contract (<=5e-3 relative). The try only
    # tolerates the path being unavailable; the contract assert is OUTSIDE
    # it so a violation fails the bench hard.
    err_bf16 = None
    bf16_scale = 1.0
    try:
        xh = x.astype(jnp.bfloat16)
        fn_bf16 = jax.jit(lambda v: flt.apply(v, method="bf16"))
        candidates["bf16_io"] = round(
            _bench(fn_bf16, xh, iters=diag_iters), 6)
        y_bf = np.asarray(fn_bf16(x[:16]), dtype=np.float32)
        y_f32 = np.asarray(jax.jit(
            lambda v: flt.apply(v, method="xla"))(x[:16]))
        err_bf16 = float(np.abs(y_bf - y_f32).max())
        bf16_scale = max(1.0, float(np.abs(y_f32).max()))
    except Exception as e:
        _EX["path_errors"]["bf16"] = f"{type(e).__name__}: {e}"[:200]
    if err_bf16 is not None:
        assert err_bf16 <= 5e-3 * bf16_scale, (
            f"bf16 mode outside its 5e-3 contract: {err_bf16:.3e}")
        _EX["max_abs_err_bf16_vs_xla"] = err_bf16

    # on-device 1D rate: chained k-difference cancels the tunnel RTT and
    # dispatch variance the wall headline carries (±20-40% run-to-run)
    if _time_left(140):
        _note("chained 1D metric")
        per_step_1d = _bench_chained(lambda v: flt.apply(v), x,
                                     key="throughput_1d_chained_gs_s")
        if per_step_1d is not None:
            _EX["throughput_1d_chained_gs_s"] = round(
                B * N / per_step_1d / 1e9, 3)
    else:
        _note("SKIP chained 1D metric (deadline)")

    # ---- extras: 2D 2048x2048, 11x11 window, order 3 ---------------------
    # 16 images amortize the per-dispatch tunnel overhead (~2-4 ms) so the
    # wall number approaches the on-device rate
    img = _dev_normal(1, (16, 2048, 2048))
    f2 = sg.Savgol2D.create(sg.Savgol2DConfig(5, 5, 3), dtype=jnp.float32)
    _note("2D wall metrics")
    fn2_default = jax.jit(lambda v: f2.apply(v))      # method="auto"
    secs2 = _bench(fn2_default, img, iters=10)
    _EX["throughput_2d_gpix_s"] = round(
        img.shape[0] * 2048 * 2048 / secs2 / 1e9, 3)

    fn2_xla = jax.jit(lambda v: f2.apply(v, method="xla"))
    y2_default = np.asarray(fn2_default(img[:1, :256, :256]))
    y2_xla = np.asarray(fn2_xla(img[:1, :256, :256]))
    err2_gate = float(np.abs(y2_default - y2_xla).max())
    scale2 = float(np.abs(y2_xla).max())
    assert err2_gate <= 1e-5 * max(1.0, scale2), (
        f"2D default-path output diverges from XLA HIGHEST on hardware: "
        f"max abs err {err2_gate:.3e}")
    _EX["max_abs_err_2d_default_vs_xla"] = err2_gate

    # ---- secondary on-hardware parity gates ------------------------------
    # every fast path vs the XLA HIGHEST twin, on the same data on-chip
    gates = _EX["hardware_parity_gates"]
    _note("hardware parity gates")
    xs_small = jnp.asarray(rng.standard_normal((2, 20_000)),
                           dtype=jnp.float32)
    y_fold = np.asarray(jax.jit(
        lambda v: flt.apply(v))(xs_small))          # thin batch -> folded
    y_ref = np.asarray(jax.jit(
        lambda v: flt.apply(v, method="xla"))(xs_small))
    gates["fold_thin_batch"] = float(np.abs(y_fold - y_ref).max())

    from savgol_tpu.ops.sweep import savgol_apply_sweep
    xsw = jnp.asarray(rng.standard_normal(8192), dtype=jnp.float32)
    ns_ = jnp.asarray([4, 12, 32])
    ms_ = jnp.asarray([2, 4, 6])
    ysw = np.asarray(jax.jit(
        lambda v: savgol_apply_sweep(v, ns_, ms_))(xsw))
    ysw_ref = np.asarray(jax.jit(
        lambda v: savgol_apply_sweep(v, ns_, ms_, method="xla"))(xsw))
    gates["sweep_vs_xla"] = float(np.abs(ysw - ysw_ref).max())

    bank = sg.SavgolBank.smooth_and_derivatives(12, 4, 2)
    xbk = jnp.asarray(rng.standard_normal((8, 8192)), dtype=jnp.float32)
    ybk = np.asarray(jax.jit(lambda v: bank.apply(v))(xbk))
    ybk_ref = np.stack([np.asarray(
        sg.Savgol1D.create(sg.SavgolConfig(12, 4, d)).apply(
            xbk, method="xla")) for d in range(3)])
    gates["bank_vs_xla"] = float(np.abs(ybk - ybk_ref).max())

    from savgol_tpu.ops.pallas_conv import correlate2d_valid_pallas_sep
    from savgol_tpu.ops.apply2d import correlate2d_valid
    ysep = np.asarray(jax.jit(lambda v: correlate2d_valid_pallas_sep(
        v, np.asarray(f2.weights)))(img[:1, :256, :256]))
    ysep_ref = np.asarray(jax.jit(lambda v: correlate2d_valid(
        v, f2.weights))(img[:1, :256, :256]))
    gates["sep2d_vs_xla"] = float(np.abs(ysep - ysep_ref).max())

    for k, v in gates.items():
        assert v <= 2e-5, f"hardware parity gate failed: {k} err {v:.3e}"
        gates[k] = round(v, 10)

    # all wall metrics are done: start the CPU-side native head-to-head
    # concurrently with the chained stages below
    native_proc = None
    if _time_left(160):
        _note("native host head-to-head (concurrent subprocess)")
        native_proc = _start_native_bench()
    else:
        _note("SKIP native host head-to-head (deadline)")

    # chained on-device 2D exact rate (the wall number above re-dispatches
    # identical inputs, which the virtualized dev stack can dedup, and
    # carries ~2-6 ms tunnel RTT per dispatch; the k-difference cancels
    # both).
    if _time_left(120):
        _note("chained 2D exact metric")
        per_step2 = _bench_chained(lambda v: f2.apply(v), img,
                                   key="throughput_2d_chained_gpix_s")
        if per_step2 is not None:
            _EX["throughput_2d_chained_gpix_s"] = round(
                img.shape[0] * 2048 * 2048 / per_step2 / 1e9, 3)
    else:
        _note("SKIP chained 2D exact metric (deadline)")

    # 2D bf16 throughput mode (row-banded MXU kernel, its own contract;
    # assert outside the try — see the 1D gate above)
    err2_bf16 = None
    try:
        fn2_bf16 = jax.jit(lambda v: f2.apply(v, method="bf16"))
        secs2b = _bench(fn2_bf16, img.astype(jnp.bfloat16), iters=10)
        _EX["throughput_2d_bf16_gpix_s"] = round(
            img.shape[0] * 2048 * 2048 / secs2b / 1e9, 3)
        y2_bf = np.asarray(fn2_bf16(img[:1, :256, :256]), dtype=np.float32)
        err2_bf16 = float(np.abs(y2_bf - y2_xla).max())

        if _time_left(120):
            _note("chained 2D bf16 metric")
            per_step = _bench_chained(
                lambda v: f2.apply(v, method="bf16"),
                img.astype(jnp.bfloat16),
                key="throughput_2d_bf16_chained_gpix_s")
            if per_step is not None:
                _EX["throughput_2d_bf16_chained_gpix_s"] = round(
                    img.shape[0] * 2048 * 2048 / per_step / 1e9, 3)
        else:
            _note("SKIP chained 2D bf16 metric (deadline)")
    except Exception as e:
        _EX["path_errors"]["bf16_2d"] = f"{type(e).__name__}: {e}"[:200]
    if err2_bf16 is not None:
        assert err2_bf16 <= 5e-3 * max(1.0, scale2), (
            f"2D bf16 mode outside its 5e-3 contract: {err2_bf16:.3e}")
        _EX["max_abs_err_2d_bf16_vs_xla"] = err2_bf16


    # ---- masked / nonuniform capability paths (chained) -------------------
    # VERDICT r03 #2: the flagship capabilities must carry numbers like the
    # stencil paths do. Chained k-difference, deadline-guarded per row.
    masked_rates = {}
    if _time_left(240):
        _note("masked/nonuniform chained metrics")
        _EX["masked_nonuniform"] = masked_rates
        from savgol_tpu.ops.masked import (savgol_apply_masked,
                                           savgol2d_apply_masked)
        from savgol_tpu.ops.nonuniform import savgol_apply_nonuniform
        holes = _dev_holes(1002, (64, 131_072), 0.2)
        xm = jnp.where(holes, jnp.nan, _dev_normal(2, (64, 131_072)))
        mk = ~holes

        # hardware parity gate first (small shape): TPU fused/plane
        # pipeline vs the XLA method twin on the same data on-chip.
        # Gate WELL-CONDITIONED windows only: both sides are f32 normal
        # equations, and hole-starved windows (count near m+1) amplify
        # their differing Gram rounding by cond^2 — a 1e-3-class spread
        # there is solver conditioning, not a Mosaic divergence (the
        # f64-oracle CPU lanes own that regime).
        ym_tpu = np.asarray(jax.jit(lambda v: savgol_apply_masked(
            v, half_window=12, poly_order=4, mask=mk[:2, :8192],
            fill=0.0))(xm[:2, :8192]))
        ym_xla = np.asarray(jax.jit(lambda v: savgol_apply_masked(
            v, half_window=12, poly_order=4, mask=mk[:2, :8192],
            fill=0.0, method="xla"))(xm[:2, :8192]))
        mk_np = np.asarray(mk[:2, :8192])
        counts = np.stack([np.convolve(row.astype(int), np.ones(25, int),
                                       "same") for row in mk_np])
        well = counts >= 18          # >= 70% coverage: cond(A) ~ O(10)
        gates["masked_vs_xla"] = float(
            np.abs((ym_tpu - ym_xla)[well]).max())
        assert gates["masked_vs_xla"] <= 2e-4, (
            f"masked hw parity: {gates['masked_vs_xla']:.3e}")

        with _row("masked1d_normal_gs_s"):
            per = _bench_chained(lambda v: savgol_apply_masked(
                v, half_window=12, poly_order=4, mask=mk, fill=0.0), xm,
                key="masked1d_normal_gs_s")
            if per is not None:
                masked_rates["masked1d_normal_gs_s"] = round(
                    xm.size / per / 1e9, 3)
        if _time_left(150):
          with _row("masked1d_qr_gs_s"):
            xq = xm[:8]
            per = _bench_chained(lambda v: savgol_apply_masked(
                v, half_window=12, poly_order=4, mask=mk[:8], fill=0.0,
                solver="qr"), xq, key="masked1d_qr_gs_s")
            if per is not None:
                masked_rates["masked1d_qr_gs_s"] = round(
                    xq.size / per / 1e9, 3)
        if _time_left(130):
          with _row("masked2d_mpix_s"):
            holes2 = _dev_holes(1003, (1024, 1024), 0.2)
            imj = jnp.where(holes2, jnp.nan, _dev_normal(3, (1024, 1024)))
            mk2 = ~holes2
            per = _bench_chained(lambda v: savgol2d_apply_masked(
                v, half_window_x=5, half_window_y=5, poly_order=3,
                mask=mk2, fill=0.0), imj, key="masked2d_mpix_s")
            if per is not None:
                masked_rates["masked2d_mpix_s"] = round(
                    imj.size / per / 1e6, 1)
        if _time_left(100):
          with _row("nonuniform_gs_s"):
            import jax as _jax
            tn = jnp.cumsum(_jax.random.uniform(
                _jax.random.PRNGKey(1004), (8, 131_072)) + 0.5, axis=-1)
            xn = _dev_normal(4, (8, 131_072))
            per = _bench_chained(lambda v: savgol_apply_nonuniform(
                v, tn, half_window=12, poly_order=4, fill=0.0), xn,
                key="nonuniform_gs_s")
            if per is not None:
                masked_rates["nonuniform_gs_s"] = round(
                    xn.size / per / 1e9, 3)
        if _time_left(110):
          with _row("resample_ms_s"):
            # recentered-plane resample (VERDICT r04 #4): sorted data,
            # uniform query grid — the probe_masked.py config
            from savgol_tpu.ops.nonuniform import savgol_resample
            import jax as _jax
            t1 = jnp.cumsum(_jax.random.uniform(
                _jax.random.PRNGKey(1005), (131_072,)) + 0.5)
            tq1 = jnp.linspace(t1[0], t1[-1], 131_072)
            xr = _dev_normal(5, (8, 131_072))
            per = _bench_chained(lambda v: savgol_resample(
                v, t1, tq1, half_window=12, poly_order=4, fill=0.0),
                xr, key="resample_ms_s")
            if per is not None:
                masked_rates["resample_ms_s"] = round(
                    xr.size / per / 1e6, 1)
        if _time_left(120):
          with _row("sweep_marginal_4m_gs_s_per_config"):
            # (n, m) sweep MARGINAL at 4M (VERDICT r04 #8): the 131k
            # bench size is per-call-fixed-cost bound (~0.7 ms of
            # virtualized-chip launch overhead, probe_sweep.py); at 4M
            # the fixed cost amortizes and the conv marginal shows.
            # k=16: smaller chains collapse below the protocol's noise
            # floor (measured ratio 1.26 at k=8).
            from savgol_tpu.ops.sweep import savgol_apply_sweep
            xsw4 = _dev_normal(6, (4_194_304,))
            ns6 = jnp.asarray([4, 8, 12, 16, 24, 32])
            ms6 = jnp.asarray([2, 3, 4, 4, 5, 6])
            per = _bench_chained(
                lambda v: savgol_apply_sweep(v, ns6, ms6).sum(axis=0)
                * 1e-3 + v,
                xsw4, key="sweep_marginal_4m_gs_s_per_config",
                iters=3, k=16)
            if per is not None:
                masked_rates["sweep_marginal_4m_gs_s_per_config"] = (
                    round(xsw4.size / per / 1e9, 3))
    else:
        _note("SKIP masked/nonuniform metrics (deadline)")

    # ---- streaming: measured on-TPU per-push latency (VERDICT r04 #6) ----
    # The reference's streaming story is LATENCY (one sample per call,
    # src/savgol_stream.c:289-295). Two honestly-labeled numbers:
    #   * stream_push_dispatch_us: wall per jitted stream_push round-trip —
    #     through this dev tunnel it is RTT-dominated, so it is an UPPER
    #     bound (real-time per-sample users belong on the native host
    #     engine's ~1 us push; README "Streaming" section);
    #   * stream_scan_ondevice_ns_per_sample: per-sample on-device cost of
    #     the same push protocol inside lax.scan (stream_apply, chained) —
    #     the on-chip latency floor once samples are resident.
    if _time_left(70):
        _note("streaming latency")
        try:
            from savgol_tpu.stream import stream_init, stream_push
            from savgol_tpu.stream import stream_apply as _stream_apply
            cw = flt.center_weights
            ew = flt.edge_weights
            st0 = stream_init(12, dtype=jnp.float32)
            push = jax.jit(lambda s, v: stream_push(s, v, cw))
            st, val, ok = push(st0, jnp.float32(1.0))
            jax.block_until_ready(val)
            t0 = time.perf_counter()
            reps = 100
            for i in range(reps):
                st, val, ok = push(st, jnp.float32(i))
            jax.block_until_ready(val)
            _EX["stream_push_dispatch_us"] = round(
                (time.perf_counter() - t0) / reps * 1e6, 1)
            xs1 = jnp.asarray(rng.standard_normal(8192), dtype=jnp.float32)
            per = _bench_chained(
                lambda v: _stream_apply(v, cw, ew, half_window=12),
                xs1, key="stream_scan_ns")
            if per is not None:
                _EX["stream_scan_ondevice_ns_per_sample"] = round(
                    per / xs1.size * 1e9, 1)
        except Exception as e:
            _EX.setdefault("path_errors", {})["streaming_latency"] = (
                f"{type(e).__name__}: {e}"[:160])

    # ---- accuracy: DEFAULT f32 pipeline vs scipy f64 oracle --------------
    try:
        from scipy.signal import savgol_filter
        xs = rng.standard_normal(10_000).astype(np.float32)
        ours = np.asarray(fn_default(jnp.asarray(xs)[None, :]))[0]
        ref = savgol_filter(xs.astype(np.float64), 25, 4, mode="interp")
        _EX["max_abs_err_vs_scipy_f64"] = float(np.abs(ours - ref).max())
    except Exception:
        pass

    _collect_native_bench(native_proc)
    _note("done")


def _compact_line(result: dict, budget: int = 1400) -> str:
    """Compact headline record, guaranteed under ``budget`` bytes.

    Keeps the headline fields plus a fixed shortlist of load-bearing
    extras (chained on-device rates, parity-gate errors, native
    head-to-head geomeans); drops shortlist keys from the back if the
    line would still exceed the budget."""
    extras = result.get("extras", {})
    shortlist = [
        "throughput_1d_chained_gs_s",
        "throughput_2d_gpix_s",
        "throughput_2d_chained_gpix_s",
        "throughput_2d_bf16_chained_gpix_s",
        "max_abs_err_default_vs_xla",
        "max_abs_err_2d_default_vs_xla",
        "max_abs_err_vs_scipy_f64",
        "native_host_vs_reference_geomean_speedup",
        "native_host_vs_reference_geomean_speedup_2d",
        "early_exit",
        "tpu_unavailable",
        "note",
    ]
    picked = {k: extras[k] for k in shortlist if k in extras}
    if extras.get("protocols"):
        walls = {k: v for k, v in extras["protocols"].items() if v != "chained"}
        if walls:
            picked["protocols"] = walls
    while True:
        compact = {
            "metric": result["metric"],
            "value": result["value"],
            "unit": result["unit"],
            "vs_baseline": result.get("vs_baseline"),
            "extras": picked,
        }
        line = json.dumps(compact)
        if len(line) <= budget or not picked:
            return line
        picked.pop(next(reversed(picked)))


if __name__ == "__main__":
    main()
