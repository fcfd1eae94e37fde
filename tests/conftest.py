"""Test configuration.

Tests run on CPU with 8 virtual devices (sharding tests exercise a real
Mesh without TPU hardware) and with x64 enabled so f64 parity oracles are
meaningful. The axon sitecustomize pins jax_platforms to the TPU backend,
so the platform must be forced back via jax.config (env vars alone are
overridden).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# SAVGOL_HW_TESTS=1 leaves the real backend (TPU) in place for the
# on-hardware parity lane — use it ONLY with that module
# (`SAVGOL_HW_TESTS=1 pytest tests/test_hw_parity.py`); the rest of the
# suite assumes CPU + x64 oracles and is not expected to pass on TPU.
# Default: CPU with 8 virtual devices + x64 enabled.
if os.environ.get("SAVGOL_HW_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import ctypes  # noqa: E402
import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_ROOT = "/root/reference"
_REF_SO = "/tmp/libsavgol_ref_oracle.so"


def _build_reference_so():
    """Compile the reference C library into a shared object for use as a
    golden-parity oracle (SURVEY.md §4: 'golden-vector parity tests generated
    by compiling the reference C'). Nothing is copied into the repo."""
    if os.path.exists(_REF_SO):
        return _REF_SO
    srcs = [
        f"{REF_ROOT}/src/savgolFilter.c",
        f"{REF_ROOT}/src/savgol_stream.c",
        f"{REF_ROOT}/src/savgol2d.c",
    ]
    cmd = ["gcc", "-O2", "-shared", "-fPIC",
           f"-I{REF_ROOT}/include/iterative", *srcs, "-lm", "-o", _REF_SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _REF_SO


class SavgolConfigC(ctypes.Structure):
    _fields_ = [
        ("half_window", ctypes.c_uint8),
        ("poly_order", ctypes.c_uint8),
        ("derivative", ctypes.c_uint8),
        ("time_step", ctypes.c_float),
        ("boundary", ctypes.c_int),
    ]


class Savgol2DConfigC(ctypes.Structure):
    _fields_ = [
        ("half_window_x", ctypes.c_uint8),
        ("half_window_y", ctypes.c_uint8),
        ("poly_order", ctypes.c_uint8),
        ("deriv_x", ctypes.c_uint8),
        ("deriv_y", ctypes.c_uint8),
        ("delta_x", ctypes.c_float),
        ("delta_y", ctypes.c_float),
    ]


BOUNDARY_C = {"polynomial": 0, "reflect": 1, "periodic": 2, "constant": 3}
BOUNDARY2D_C = {"valid": 0, "constant": 1, "reflect": 2}


class ReferenceOracle:
    """ctypes bindings to the compiled reference library."""

    def __init__(self, so_path):
        lib = ctypes.CDLL(so_path)
        lib.savgol_create.restype = ctypes.c_void_p
        lib.savgol_create.argtypes = [ctypes.POINTER(SavgolConfigC)]
        lib.savgol_destroy.argtypes = [ctypes.c_void_p]
        lib.savgol_apply.restype = ctypes.c_int
        lib.savgol_apply.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        lib.savgol_apply_valid.restype = ctypes.c_size_t
        lib.savgol_apply_valid.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_float)]
        lib.savgol2d_create.restype = ctypes.c_void_p
        lib.savgol2d_create.argtypes = [ctypes.POINTER(Savgol2DConfigC)]
        lib.savgol2d_destroy.argtypes = [ctypes.c_void_p]
        lib.savgol2d_apply.restype = ctypes.c_int
        lib.savgol2d_apply.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        self.lib = lib

    # -- 1D ----------------------------------------------------------------

    def apply(self, x, half_window, poly_order, derivative=0,
              time_step=1.0, boundary="polynomial"):
        cfg = SavgolConfigC(half_window, poly_order, derivative,
                            time_step, BOUNDARY_C[boundary])
        f = self.lib.savgol_create(ctypes.byref(cfg))
        assert f, "reference savgol_create failed"
        x = np.ascontiguousarray(x, dtype=np.float32)
        out = np.empty_like(x)
        rc = self.lib.savgol_apply(
            f, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
        self.lib.savgol_destroy(f)
        assert rc == 0
        return out

    def apply_valid(self, x, half_window, poly_order, derivative=0,
                    time_step=1.0):
        cfg = SavgolConfigC(half_window, poly_order, derivative,
                            time_step, 0)
        f = self.lib.savgol_create(ctypes.byref(cfg))
        assert f
        x = np.ascontiguousarray(x, dtype=np.float32)
        out = np.empty(x.size - 2 * half_window, dtype=np.float32)
        count = self.lib.savgol_apply_valid(
            f, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        self.lib.savgol_destroy(f)
        assert count == out.size
        return out

    def apply_strided(self, x, half_window, poly_order, derivative=0,
                      stride_elems=3, offset_elems=1):
        """Reference savgol_apply_strided over an interleaved float layout:
        x packed at element stride ``stride_elems`` floats, field offset
        ``offset_elems`` floats (src/savgolFilter.c:877-934). Returns
        (filtered field, untouched sibling bytes of the output buffer)."""
        lib = self.lib
        lib.savgol_apply_strided.restype = ctypes.c_int
        lib.savgol_apply_strided.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_size_t]
        cfg = SavgolConfigC(half_window, poly_order, derivative, 1.0, 0)
        f = lib.savgol_create(ctypes.byref(cfg))
        assert f, "reference savgol_create failed"
        x = np.asarray(x, dtype=np.float32)
        buf_in = np.zeros((x.size, stride_elems), dtype=np.float32)
        buf_in[:, offset_elems] = x
        buf_out = np.zeros_like(buf_in)
        rc = lib.savgol_apply_strided(
            f, buf_in.ctypes.data, 4 * stride_elems, 4 * offset_elems,
            buf_out.ctypes.data, 4 * stride_elems, 4 * offset_elems,
            x.size)
        self.lib.savgol_destroy(f)
        assert rc == 0
        field = buf_out[:, offset_elems].copy()
        buf_out[:, offset_elems] = 0.0
        return field, buf_out

    def weights(self, half_window, poly_order, derivative=0):
        """Extract the reference's precomputed weight tables by reading the
        SavgolFilter struct layout (savgolFilter.h:107-113)."""
        cfg = SavgolConfigC(half_window, poly_order, derivative, 1.0, 0)
        f = self.lib.savgol_create(ctypes.byref(cfg))
        assert f
        # struct SavgolFilter { SavgolConfig config; int window_size;
        #   float dt_scale; float center[65]; float edge[32][65]; }
        class FilterC(ctypes.Structure):
            _fields_ = [
                ("config", SavgolConfigC),
                ("window_size", ctypes.c_int),
                ("dt_scale", ctypes.c_float),
                ("center", ctypes.c_float * 65),
                ("edge", (ctypes.c_float * 65) * 32),
            ]
        fs = ctypes.cast(f, ctypes.POINTER(FilterC)).contents
        ws = 2 * half_window + 1
        center = np.array(fs.center[:ws], dtype=np.float32)
        edge = np.array(
            [list(fs.edge[e])[:ws] for e in range(half_window)],
            dtype=np.float32)
        self.lib.savgol_destroy(f)
        return center, edge

    # -- streaming ----------------------------------------------------------

    def stream_run(self, x, half_window, poly_order, derivative=0,
                   time_step=1.0):
        """Run the reference's streaming API (push_full per sample + flush)
        over x; returns the emitted samples."""
        lib = self.lib
        lib.savgol_stream_create.restype = ctypes.c_void_p
        lib.savgol_stream_create.argtypes = [ctypes.POINTER(SavgolConfigC)]
        lib.savgol_stream_destroy.argtypes = [ctypes.c_void_p]
        lib.savgol_stream_push_full.restype = ctypes.c_int
        lib.savgol_stream_push_full.argtypes = [
            ctypes.c_void_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.savgol_stream_flush.restype = ctypes.c_int
        lib.savgol_stream_flush.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        cfg = SavgolConfigC(half_window, poly_order, derivative,
                            time_step, 0)
        s = lib.savgol_stream_create(ctypes.byref(cfg))
        assert s, "reference stream create failed"
        buf = np.empty(half_window + 1, dtype=np.float32)
        out = []
        for v in np.asarray(x, dtype=np.float32):
            c = lib.savgol_stream_push_full(
                s, float(v), buf.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), buf.size)
            out.extend(buf[:c].tolist())
        fbuf = np.empty(half_window, dtype=np.float32)
        c = lib.savgol_stream_flush(
            s, fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fbuf.size)
        out.extend(fbuf[:c].tolist())
        lib.savgol_stream_destroy(s)
        return np.array(out, dtype=np.float32)

    def stream_run_clamped(self, x, half_window, poly_order, derivative=0,
                           max_outputs=1, flush_max=None):
        """push_full with a small ``max_outputs`` buffer + clamped flush;
        returns (emitted, samples_output counter) — exercises the clamp
        semantics of src/savgol_stream.c:208-218 (dropped, not buffered)
        and the per-written-output counter increments."""
        lib = self.lib
        lib.savgol_stream_create.restype = ctypes.c_void_p
        lib.savgol_stream_create.argtypes = [ctypes.POINTER(SavgolConfigC)]
        lib.savgol_stream_destroy.argtypes = [ctypes.c_void_p]
        lib.savgol_stream_push_full.restype = ctypes.c_int
        lib.savgol_stream_push_full.argtypes = [
            ctypes.c_void_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.savgol_stream_flush.restype = ctypes.c_int
        lib.savgol_stream_flush.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.savgol_stream_samples_output.restype = ctypes.c_size_t
        lib.savgol_stream_samples_output.argtypes = [ctypes.c_void_p]
        cfg = SavgolConfigC(half_window, poly_order, derivative, 1.0, 0)
        s = lib.savgol_stream_create(ctypes.byref(cfg))
        assert s, "reference stream create failed"
        buf = np.empty(max(int(max_outputs), 1), dtype=np.float32)
        out = []
        for v in np.asarray(x, dtype=np.float32):
            c = lib.savgol_stream_push_full(
                s, float(v),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                int(max_outputs))
            out.extend(buf[:c].tolist())
        fm = half_window if flush_max is None else int(flush_max)
        fbuf = np.empty(max(fm, 1), dtype=np.float32)
        c = lib.savgol_stream_flush(
            s, fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), fm)
        out.extend(fbuf[:max(c, 0)].tolist())
        counter = int(lib.savgol_stream_samples_output(s))
        lib.savgol_stream_destroy(s)
        return np.array(out, dtype=np.float32), counter

    # -- 2D ----------------------------------------------------------------

    def apply2d(self, img, half_window_x, half_window_y, poly_order,
                deriv_x=0, deriv_y=0, delta_x=1.0, delta_y=1.0,
                boundary="constant"):
        cfg = Savgol2DConfigC(half_window_x, half_window_y, poly_order,
                              deriv_x, deriv_y, delta_x, delta_y)
        f = self.lib.savgol2d_create(ctypes.byref(cfg))
        if not f:
            return None   # degenerate geometry (singular normal matrix)
        img = np.ascontiguousarray(img, dtype=np.float32)
        rows, cols = img.shape
        if boundary == "valid":
            out = np.zeros_like(img)  # reference writes into offset region
        else:
            out = np.empty_like(img)
        rc = self.lib.savgol2d_apply(
            f, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, cols, cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cols,
            BOUNDARY2D_C[boundary])
        self.lib.savgol2d_destroy(f)
        assert rc == 0
        if boundary == "valid":
            return out[half_window_y:rows - half_window_y,
                       half_window_x:cols - half_window_x]
        return out


@pytest.fixture(scope="session")
def ref():
    """Compiled reference library as golden oracle; skips if unbuildable."""
    try:
        so = _build_reference_so()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"could not build reference oracle: {e}")
    return ReferenceOracle(so)
