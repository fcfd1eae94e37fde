"""Speed-of-light roofline model for the Pallas filter kernels.

The reference's performance story is relative speedups over a naive CPU
loop (README.md:8,51 in /root/reference). A TPU-first framework owes its
users an *absolute* model instead: for a given (config, shape, dtype,
method), what is the hardware ceiling, and what fraction of it does a
measured time achieve? This module encodes the kernel cost model that the
round-3 per-step accounting validated on a v5e (ROADMAP.md):

* 1D banded-MXU kernels (exact ``mxu`` and ``bf16``): every output sample
  costs one 2-band K=256 matmul column regardless of tap count (zeros in
  the band matrices ride free — ops/pallas_conv.py), i.e. 512 MACs.
* 2D row-banded MXU kernels: ``wh`` row-matmuls of K=128 per output
  pixel, i.e. ``wh * 128`` MACs (ops/pallas_conv.py::_corr2d_rowmxu_call).
* Exact-f32 contractions run at ``Precision.HIGHEST`` = 6 bf16 MXU passes
  (bf16x6); the bf16 throughput mode is a single pass.
* HBM traffic lower bound = input + output bytes (boundary strips, band
  matrices and padding are O(window) or O(tile) and ignored).

Sanity anchors (measured, chained k-difference on one v5e): the 1D exact
default at 30.5 Gs/s is 47% of this model's 64 Gs/s MXU ceiling — the
"~50% effective MXU utilization" plateau documented in ROADMAP.md; the 2D
bf16 kernel at 22.4 Gpix/s is 32% of the 70 Gpix/s ceiling — matching the
kernel's measured "~32% MXU" attribution.

The VPU tap-loop kernels are load/relayout-bound, not FMA-bound
(ROADMAP.md "Known techniques"); no trustworthy public VPU FLOP peak is
baked in, so for ``method="vpu"`` only the HBM bound is reported
(``mxu_bound_s = 0``) and the ceiling is the bandwidth ceiling.
"""

from __future__ import annotations

import dataclasses

__all__ = ["ChipSpec", "V5E", "Roofline", "speed_of_light_1d",
           "speed_of_light_2d", "speed_of_light_masked_1d",
           "speed_of_light_masked_2d", "speed_of_light_nonuniform"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-chip peaks. Defaults describe one TPU v5e (v5litepod) chip:
    197 TFLOP/s dense bf16 on the MXU and 819 GB/s HBM bandwidth
    (public Google Cloud figures)."""
    name: str
    bf16_tflops: float
    hbm_gbps: float


V5E = ChipSpec("v5e", bf16_tflops=197.0, hbm_gbps=819.0)

# MXU passes per exact-f32 contraction: Precision.HIGHEST lowers to the
# bf16x6 emulation on TPU (3 operand splits x 2 sides accumulated in f32)
_EXACT_PASSES = 6

_DTYPE_BYTES = {"float32": 4, "bfloat16": 2, "float64": 8, "float16": 2}


def _nbytes(dtype) -> int:
    name = getattr(dtype, "name", None) or str(dtype)
    try:
        return _DTYPE_BYTES[name]
    except KeyError:
        raise ValueError(f"unsupported dtype for the roofline model: "
                         f"{dtype!r}") from None


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Per-call cost model and the resulting hardware ceiling."""
    elements: int          # output samples (1D) or pixels (2D) per call
    mxu_flops: float       # total MXU flops per call, incl. bf16x6 passes
    hbm_bytes: float       # input + output bytes (traffic lower bound)
    mxu_bound_s: float     # mxu_flops / peak
    hbm_bound_s: float     # hbm_bytes / bandwidth
    chip: ChipSpec

    @property
    def bound(self) -> str:
        """Which ceiling binds: 'mxu' or 'hbm'."""
        return "mxu" if self.mxu_bound_s >= self.hbm_bound_s else "hbm"

    @property
    def ceiling_s(self) -> float:
        """Fastest possible per-call seconds on this chip."""
        return max(self.mxu_bound_s, self.hbm_bound_s)

    @property
    def ceiling_per_s(self) -> float:
        """Speed-of-light throughput (samples/s or pixels/s)."""
        return self.elements / self.ceiling_s

    def utilization(self, measured_s: float) -> float:
        """Fraction of the binding ceiling a measured per-call time
        achieves (1.0 = speed of light). Use an on-device time from
        ``profiling.benchmark_chained`` — wall times on remote devices
        include dispatch RTT and understate utilization."""
        if measured_s <= 0:
            raise ValueError("measured_s must be positive")
        return self.ceiling_s / measured_s

    def describe(self, measured_s: float | None = None) -> str:
        ai = self.mxu_flops / self.hbm_bytes if self.hbm_bytes else 0.0
        lines = [
            f"chip {self.chip.name}: {self.chip.bf16_tflops:.0f} TFLOP/s "
            f"bf16, {self.chip.hbm_gbps:.0f} GB/s HBM",
            f"per call: {self.elements:.3g} outputs, "
            f"{self.mxu_flops:.3g} MXU flops, {self.hbm_bytes:.3g} HBM "
            f"bytes (AI {ai:.1f} flop/B)",
            f"bounds: mxu {self.mxu_bound_s * 1e3:.3f} ms, hbm "
            f"{self.hbm_bound_s * 1e3:.3f} ms -> {self.bound}-bound, "
            f"ceiling {self.ceiling_per_s / 1e9:.1f} G/s",
        ]
        if measured_s is not None:
            lines.append(f"measured {measured_s * 1e3:.3f} ms = "
                         f"{100 * self.utilization(measured_s):.0f}% of "
                         f"speed of light")
        return "\n".join(lines)


def _build(elements: int, macs_per_out: float, passes: int,
           in_bytes: int, out_bytes: int, chip: ChipSpec) -> Roofline:
    mxu_flops = float(elements) * macs_per_out * 2.0 * passes
    hbm_bytes = float(elements) * (in_bytes + out_bytes)
    return Roofline(
        elements=elements,
        mxu_flops=mxu_flops,
        hbm_bytes=hbm_bytes,
        mxu_bound_s=mxu_flops / (chip.bf16_tflops * 1e12),
        hbm_bound_s=hbm_bytes / (chip.hbm_gbps * 1e9),
        chip=chip)


def _resolve(method: str, dtype_bytes: int) -> tuple[str, int]:
    """(kernel family, exact passes). 'auto' follows the library dispatch
    for wide batches: banded MXU, exact for f32 in / single-pass for bf16
    in (ops/apply.py::_resolve_method + the kernels' own batch picker)."""
    if method == "auto":
        method = "bf16" if dtype_bytes == 2 else "mxu"
    if method in ("mxu", "xla"):
        return "mxu", _EXACT_PASSES
    if method == "bf16":
        return "mxu", 1
    if method in ("vpu", "pallas"):
        return "vpu", 0
    raise ValueError(f"method must be auto/mxu/bf16/vpu, got {method!r}")


def speed_of_light_1d(shape, *, dtype="float32", method: str = "auto",
                      chip: ChipSpec = V5E) -> Roofline:
    """Roofline for a batched 1D apply of ``shape`` (..., N).

    The banded-MXU kernels' cost is WINDOW-INDEPENDENT (one 2-band K=256
    matmul column per output for every window up to 129 taps), so no
    config argument is needed for the MXU paths.
    """
    elements = 1
    for s in shape:
        elements *= int(s)
    b = _nbytes(dtype)
    family, passes = _resolve(method, b)
    macs = 256.0 if family == "mxu" else 0.0
    return _build(elements, macs, passes if family == "mxu" else 0,
                  b, b, chip)


def speed_of_light_masked_1d(poly_order: int, *, shape, dtype="float32",
                             chip: ChipSpec = V5E) -> Roofline:
    """Roofline for the masked 1D NORMAL path — the fused single-VMEM-pass
    moment kernel (ops/pallas_masked.py): 2m+1 weight-moment + (m+1) rhs
    + 1 count bank correlations (banded MXU, HIGHEST = 6 passes, 256
    MACs per stencil output; the Kp Gram planes are reconstructed from
    the moments on the VPU, uncounted) with the plane Cholesky fused
    in-kernel, so the only HBM traffic is x + mask in, y out. Assumes
    ws >= 2m+1 (configs with m > half the window clamp S to ws and cost
    slightly less). The solve's VPU cost is uncounted (measured ~free —
    probe_psolve.py: 12-35 Gpos/s standalone).
    """
    m = int(poly_order)
    elements = 1
    for s in shape:
        elements *= int(s)
    b = _nbytes(dtype)
    bytes_per = b + 1 + b                       # x in + mask(1B) + y out
    macs = (2 * m + 1 + m + 1 + 1) * 256.0
    mxu_flops = float(elements) * macs * 2.0 * _EXACT_PASSES
    hbm_bytes = float(elements) * bytes_per
    return Roofline(elements=elements, mxu_flops=mxu_flops,
                    hbm_bytes=hbm_bytes,
                    mxu_bound_s=mxu_flops / (chip.bf16_tflops * 1e12),
                    hbm_bound_s=hbm_bytes / (chip.hbm_gbps * 1e9),
                    chip=chip)


def speed_of_light_masked_2d(window_h: int, window_w: int, poly_order: int,
                             *, shape, dtype="float32",
                             chip: ChipSpec = V5E) -> Roofline:
    """Roofline for the masked 2D path — the fused tensor-moment kernel
    (ops/pallas_masked2d.py). In the tensor-product orthonormal basis the
    whole Gram is a fixed combination of T = (2m+1)(2m+2)/2 separable
    tensor moments; per 128-lane block each moment (and each of the
    P = (m+1)(m+2)/2 rhs projections) costs ONE vertical VPU slab
    combination (shared, uncounted) + ONE K=256 banded matmul at HIGHEST
    — window-size-independent, ~18x fewer MXU flops than the staged
    stack-kernel pipeline this replaced (its model ceiling was 179
    Mpix/s at 11x11 o3; measured fused chained rate is 542, i.e. ~32% of
    THIS model — the same plateau as every row-banded kernel). Gram
    assembly, plane Cholesky and extraction stay in VMEM, so HBM traffic
    is image + mask in, y out. ``window_h``/``window_w`` do not enter the
    MXU cost; they are kept for call-site documentation."""
    del window_h, window_w
    m = int(poly_order)
    p = (m + 1) * (m + 2) // 2
    t = (2 * m + 1) * (2 * m + 2) // 2
    elements = 1
    for s in shape:
        elements *= int(s)
    b = _nbytes(dtype)
    bytes_per = b + 1 + b                       # image in + mask(1B) + y out
    macs = (t + p) * 256.0
    mxu_flops = float(elements) * macs * 2.0 * _EXACT_PASSES
    hbm_bytes = float(elements) * bytes_per
    return Roofline(elements=elements, mxu_flops=mxu_flops,
                    hbm_bytes=hbm_bytes,
                    mxu_bound_s=mxu_flops / (chip.bf16_tflops * 1e12),
                    hbm_bound_s=hbm_bytes / (chip.hbm_gbps * 1e9),
                    chip=chip)


def speed_of_light_nonuniform(half_window: int, poly_order: int, *, shape,
                              dtype="float32",
                              chip: ChipSpec = V5E) -> Roofline:
    """Roofline for the nonuniform path — the fused dd-moment kernel
    (ops/pallas_nonuniform.py): per output position, ws = 2n+1 slab taps
    accumulate the 2m+1 Hankel Gram moments + (m+1) rhs moments in
    DOUBLE-WORD (two-float EFT) arithmetic, then the dd plane Cholesky
    solves in the same VMEM pass. The window tensors and design matrix of
    the old staged pipeline (whose materialization bound this model used
    to publish, 507 Ms/s at n=12 m=4) are never formed, so the HBM lower
    bound is just x + t + weights in, y out — but the kernel is nowhere
    near it: it is VPU-bound on the dd multiply-accumulates (~10-20 VPU
    flops per dd-FMA, ws*(3m+4) dd-FMAs per position), and, like
    ``method="vpu"``, no trustworthy public VPU FLOP peak exists to bake
    in, so only the HBM bound is reported (``mxu_bound_s = 0``). Treat
    ``utilization`` against it as a traffic statement, not a compute one;
    the kernel's real scaling lever is tile geometry (measured 76/129/214
    Ms/s at cols 1024/2048/4096 — ROADMAP round-5). ``half_window`` and
    ``poly_order`` are kept for call-site documentation."""
    del half_window, poly_order
    elements = 1
    for s in shape:
        elements *= int(s)
    b = _nbytes(dtype)
    bytes_per = 3 * b + b                       # x, t, weights in + y out
    hbm_bytes = float(elements) * bytes_per
    return Roofline(elements=elements, mxu_flops=0.0,
                    hbm_bytes=hbm_bytes,
                    mxu_bound_s=0.0,
                    hbm_bound_s=hbm_bytes / (chip.hbm_gbps * 1e9),
                    chip=chip)


def speed_of_light_2d(window_h: int, *, shape, dtype="float32",
                      method: str = "auto", chip: ChipSpec = V5E) -> Roofline:
    """Roofline for a 2D apply: ``window_h`` = 2*half_window_y + 1 rows in
    the stencil; ``shape`` = (..., rows, cols) output pixels. Models the
    row-banded MXU kernel (wh K=128-quantized row matmuls per pixel); the
    const-baked dense kernel's VPU cost is not modeled (see module doc).
    """
    elements = 1
    for s in shape:
        elements *= int(s)
    b = _nbytes(dtype)
    family, passes = _resolve(method, b)
    macs = float(window_h) * 128.0 if family == "mxu" else 0.0
    return _build(elements, macs, passes if family == "mxu" else 0,
                  b, b, chip)
