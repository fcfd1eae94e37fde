"""Demo: the embedded / real-time host domain (no TPU required).

The reference is a host C library for exactly this domain; here it is
served by the native C++ engine (C ABI + ctypes):

  * microsecond-latency sample-by-sample streaming,
  * filtering one field of an interleaved sensor-record array in place
    (the reference's savgol_apply_strided use case),
  * exporting weights as a self-contained C header for an MCU.

    python examples/embedded_host.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import savgol_tpu as sg
    from savgol_tpu import native
    from savgol_tpu.utils.export import generate_header

    cfg = sg.SavgolConfig(half_window=6, poly_order=3)
    rng = np.random.default_rng(3)

    # --- streaming: push one sample at a time, fixed latency n ----------
    stream = native.HostSavgolStream(cfg)
    signal = (np.sin(np.linspace(0, 8, 2000))
              + 0.2 * rng.standard_normal(2000)).astype(np.float32)
    t0 = time.perf_counter()
    outputs = []
    for s in signal:
        v, valid = stream.push(float(s))
        if valid:
            outputs.append(v)
    per_sample_us = (time.perf_counter() - t0) / signal.size * 1e6
    print(f"streaming: {len(outputs)} outputs, latency={stream.latency} "
          f"samples, {per_sample_us:.2f} us/sample (ctypes incl.)")

    # --- strided: filter the 'phase' field of interleaved records -------
    records = np.zeros(1000, dtype=[("timestamp", np.float32),
                                    ("phase", np.float32),
                                    ("flags", np.float32)])
    records["timestamp"] = np.arange(1000)
    records["phase"] = signal[:1000]
    records["flags"] = 7.0
    engine = native.HostSavgol1D(cfg)
    out = np.zeros_like(records)
    engine.apply_strided(records["phase"], out["phase"])
    assert np.all(out["timestamp"] == 0) and np.all(out["flags"] == 0), \
        "sibling fields must stay untouched"
    print(f"strided: filtered records['phase'] in place of a "
          f"{records.dtype.itemsize}-byte record; siblings untouched")

    # --- export: self-contained C header for an MCU ---------------------
    header = generate_header(cfg, prefix="IMU")
    print(f"export: {len(header.splitlines())}-line C header "
          f"(IMU_CENTER_WEIGHTS[{cfg.window_size}], "
          f"IMU_EDGE_WEIGHTS[{cfg.half_window}][{cfg.window_size}], "
          "inline IMU_apply)")

    # --- cross-check the three paths on the same data -------------------
    # push() emits center outputs only (the leading n come from
    # push_full at fill time), so the stream covers batch[n:].
    batch = engine.apply(signal)
    streamed = np.asarray(outputs + list(stream.flush()), dtype=np.float32)
    print(f"stream==batch max abs diff: "
          f"{np.abs(streamed - batch[cfg.half_window:]).max():.2e}")


if __name__ == "__main__":
    main()
