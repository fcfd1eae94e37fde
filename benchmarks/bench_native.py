"""Host-CPU head-to-head: the native savgol_tpu engine vs the reference.

The reference's only published performance number is host-CPU throughput
(test/iterative/test_savgol_main.c:136-155 — repeated ``savgol_apply``
over one buffer, Msamples/sec). This harness settles "matches or beats
the reference on its own headline benchmark" directly:

  * compiles the reference C at full optimization (-O3 -march=native —
    the same flags native/Makefile gives our engine; the reference's own
    Release build would use -O3),
  * compiles native/bench_host.cpp, which dlopens BOTH engines and runs
    identical timing loops in-process (no ctypes overhead in the
    measured region),
  * sweeps the reference's demo config (n=6, m=3) plus the BASELINE
    headline config (n=12, m=4, d=0/1) over N = 360 .. 1M.

Run: ``python benchmarks/bench_native.py``  (host CPU only — no JAX).
Prints the per-row table from the C driver and a final one-line JSON
summary with the geometric-mean speedup.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
REF_ROOT = "/root/reference"
REF_SO = "/tmp/libsavgol_ref_bench.so"
BENCH_EXE = "/tmp/savgol_bench_host"


def _run(cmd, **kw):
    proc = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"{cmd[0]} failed (rc {proc.returncode}); "
                           "stderr above")


def build_all() -> tuple[str, str]:
    _run(["make", "-C", NATIVE])
    # Reference at full optimization (1D batch + 2D libraries).
    _run(["gcc", "-O3", "-march=native", "-shared", "-fPIC",
          f"-I{REF_ROOT}/include/iterative",
          f"{REF_ROOT}/src/savgolFilter.c", f"{REF_ROOT}/src/savgol2d.c",
          "-lm", "-o", REF_SO])
    _run(["g++", "-O3", "-std=c++17", "-march=native",
          os.path.join(NATIVE, "bench_host.cpp"), "-ldl", "-o", BENCH_EXE])
    return os.path.join(NATIVE, "libsavgolhost.so"), REF_SO


def main() -> int:
    ours, ref = build_all()
    cmd = [BENCH_EXE, ours, ref]
    if "--quick" in sys.argv[1:]:
        cmd.append("--quick")
    proc = subprocess.run(cmd, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        return proc.returncode
    parsed = json.loads(proc.stdout.strip().splitlines()[-1])
    rows = parsed["rows"]
    rows2d = parsed.get("rows_2d", [])
    worst_diff = max(r["max_abs_diff"] for r in rows)
    gmean = math.exp(sum(math.log(r["speedup"]) for r in rows) / len(rows))
    gmean_mt = math.exp(
        sum(math.log(r["speedup_mt"]) for r in rows) / len(rows))
    gmean_2d = (math.exp(sum(math.log(r["speedup"]) for r in rows2d)
                         / len(rows2d)) if rows2d else None)
    ncpu = os.cpu_count() or 1
    summary = {
        "metric": "native_host_vs_reference_geomean_speedup",
        "value": round(gmean, 3),
        "unit": "x",
        "extras": {
            "geomean_speedup_threaded": round(gmean_mt, 3),
            "geomean_speedup_2d": (round(gmean_2d, 3)
                                   if gmean_2d else None),
            "n_host_cpus": ncpu,
            "worst_max_abs_diff": worst_diff,
            "worst_max_abs_diff_2d": (max(r["max_abs_diff"]
                                          for r in rows2d)
                                      if rows2d else None),
            "rows": rows,
            "rows_2d": rows2d,
        },
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
