"""Smoke test for the host head-to-head benchmark harness.

Runs ``benchmarks/bench_native.py --quick`` (small sizes, short timing
windows): checks the build plumbing, the dlopen ABI match against the
compiled reference, and output parity (max abs diff) for every row.
Throughput numbers in quick mode are meaningless and are not asserted.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("g++") is None or
                    shutil.which("gcc") is None,
                    reason="no host compiler")
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout unavailable")
def test_bench_native_quick_parity():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "bench_native.py"),
         "--quick"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["metric"] == "native_host_vs_reference_geomean_speedup"
    rows = summary["extras"]["rows"]
    # 3 configs x 2 quick sizes
    assert len(rows) == 6
    for r in rows:
        assert r["max_abs_diff"] <= 5e-7, r
        assert r["ref_ms_s"] > 0 and r["ours_ms_s"] > 0
    rows_2d = summary["extras"]["rows_2d"]
    # 2 configs (constant / valid) x 1 quick size
    assert len(rows_2d) == 2
    for r in rows_2d:
        assert r["max_abs_diff"] <= 5e-7, r
        assert r["ref_mpix_s"] > 0 and r["ours_mpix_s"] > 0


def test_compare_oracles_smoke():
    """The oracle-comparison tool must run end-to-end and its exact-
    rational table must show our coefficients at f64 roundoff (the
    drop-in accuracy claim) for every listed config."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "compare_oracles.py"),
         "--n-samples", "200"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "coefficient max-abs-err vs exact rational LS" in out
    import re
    ours_cols = re.findall(r"pos=[c0] \|\s+([0-9.e+-]+) \|", out)
    assert len(ours_cols) == 12            # 6 configs x (center, edge)
    assert all(float(v) < 1e-13 for v in ours_cols), ours_cols
