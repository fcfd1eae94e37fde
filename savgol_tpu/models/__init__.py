"""High-level filter objects mirroring the reference's create/apply lifecycle.

``savgol_create`` (/root/reference/src/savgolFilter.c:688-718) precomputes
weights once; applies are pure convolution. Here the same split holds:
constructing a :class:`Savgol1D` / :class:`Savgol2D` / :class:`SavgolStream`
computes weights (f64 on host, cast to the working dtype, resident on
device), and every apply is a jitted pure function of (weights, data). The
objects are read-only after construction — the JAX analog of the reference's
"thread-safe by immutability" contract (savgolFilter.h:16-19); they are
registered as pytrees so they can be passed straight through jit/vmap/scan.
"""

from savgol_tpu.models.bank import SavgolBank
from savgol_tpu.models.filter1d import Savgol1D
from savgol_tpu.models.filter2d import Savgol2D
from savgol_tpu.models.streaming import SavgolStream

__all__ = ["Savgol1D", "Savgol2D", "SavgolStream", "SavgolBank"]
