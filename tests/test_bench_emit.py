"""bench.py delivery guarantees (VERDICT r04 #1).

BENCH_r03/r04 produced no machine-readable record (tail overflow, then a
driver kill at ~1100 s). These tests pin the fixes: the compact final
line stays parseable and small, the watchdog flushes a partial record at
the internal deadline even mid-run, and a failed k-scaling falls back to
a labeled wall metric instead of skipping.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compact_line_budget_and_fields():
    bench = _load_bench()
    result = {
        "metric": "m", "value": 1.5, "unit": "u", "vs_baseline": 0.3,
        "extras": {
            "throughput_1d_chained_gs_s": 35.1,
            "max_abs_err_default_vs_xla": 1e-7,
            "early_exit": "internal deadline 850s — partial record",
            "protocols": {"masked2d_mpix_s": "wall",
                          "throughput_1d_chained_gs_s": "chained"},
            "ignored_bulk": "x" * 5000,
        },
    }
    line = bench._compact_line(result)
    assert len(line) <= 1400
    obj = json.loads(line)
    assert obj["value"] == 1.5
    assert obj["extras"]["early_exit"].startswith("internal deadline")
    # only WALL fallbacks are surfaced (chained is the default, no noise)
    assert obj["extras"]["protocols"] == {"masked2d_mpix_s": "wall"}
    assert "ignored_bulk" not in json.dumps(obj)


def test_emit_is_idempotent_and_skips_on_failure():
    bench = _load_bench()
    bench.RESULT["value"] = 2.0
    bench._emit(code=None, reason="first")          # prints, no exit
    assert bench._EMITTED
    # second call is a no-op (no double output, no exception)
    bench._emit(code=None, reason="second")
    assert bench.RESULT["extras"]["early_exit"] == "first"

    bench2 = _load_bench()
    bench2._FAILED = True                            # gate assert fired
    bench2._emit(code=None, reason="should not land")
    assert not bench2._EMITTED
    assert "early_exit" not in bench2.RESULT["extras"]


def test_chained_fallback_publishes_labeled_wall(monkeypatch):
    """A k-scaling failure must yield a wall number labeled in protocols,
    not a skipped metric."""
    import jax.numpy as jnp

    bench = _load_bench()
    bench._DEADLINE_S = 10_000.0

    calls = []

    def fake_bench_chain(fn, x, *, iters, k, feedback_scale, return_info):
        calls.append(k)
        return 1e-3, 1.05, None          # ratio far out of band, twice

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    import chainlib
    monkeypatch.setattr(chainlib, "bench_chain", fake_bench_chain)

    x = jnp.ones((4, 128), jnp.float32)
    per = bench._bench_chained(lambda v: v * 2.0, x, key="toy_metric")
    assert calls == [2, 4]                           # exactly one retry
    assert per is not None and per > 0
    assert bench.RESULT["extras"]["protocols"]["toy_metric"] == "wall"


def test_watchdog_flushes_partial_record_under_deadline():
    """End-to-end: a bench.py run whose deadline fires almost immediately
    still exits 0 with a parseable compact JSON as the LAST stdout line."""
    env = dict(os.environ)
    env["SAVGOL_BENCH_DEADLINE_S"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = proc.stdout.strip().splitlines()[-1]
    obj = json.loads(last)
    assert "early_exit" in obj["extras"]
    assert obj["metric"] == "1d_batch_throughput_n12_m4_default_path"
