"""Seeded cross-engine fuzz parity: JAX vs native C++ vs compiled reference.

The grid tests pin specific (n, m, d, boundary) points; this file samples
the config space broadly (deterministic seed) and checks that three
independent implementations agree on the same random data:

  * the JAX apply in f64 (the accuracy master),
  * the native C++ engine (f32 SIMD, f64 weights),
  * the compiled reference C library (f32 weights + f32 convolution).

Tolerances: native-vs-JAX is f32-accumulation error; reference-vs-JAX is
looser because the reference computes its Gram recurrence in f32
(/root/reference/src/savgolFilter.c:236-303), which costs accuracy at
large (n, m). reference_edge_sign=True aligns the odd-derivative leading
edge with the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import savgol_tpu as sg
from savgol_tpu import native

F64 = jnp.float64

_rng = np.random.default_rng(0xF022)
_CASES = []
while len(_CASES) < 30:
    n = int(_rng.integers(1, 33))
    m = int(_rng.integers(0, min(2 * n, 11)))
    d = int(_rng.integers(0, min(m, 4) + 1))
    boundary = _rng.choice(list(sg.BoundaryMode))
    N = int(_rng.integers(2 * n + 1, 5000))
    _CASES.append((n, m, d, boundary, N))


@pytest.mark.parametrize("n,m,d,boundary,N", _CASES)
def test_three_way_parity(ref, n, m, d, boundary, N):
    x = np.random.default_rng(n * 1000 + N).standard_normal(N)
    x = x.astype(np.float32)
    cfg = sg.SavgolConfig(n, m, d, boundary=boundary)

    f = sg.Savgol1D.create(cfg, dtype=F64)
    ours = np.asarray(f.apply(jnp.asarray(x, dtype=F64),
                              reference_edge_sign=True))
    scale = max(1.0, np.abs(ours).max())

    got_native = native.HostSavgol1D(cfg).apply(x, reference_edge_sign=True)
    assert np.abs(got_native - ours).max() <= 4e-6 * scale, (n, m, d,
                                                             boundary, N)

    theirs = ref.apply(x, n, m, d, boundary=boundary.name.lower())
    # the reference's f32 weight recurrence drifts at large (n, m);
    # 2e-4 relative bounds the worst observed drift while still catching
    # real disagreements (wrong edges/signs/boundaries are O(1))
    assert np.abs(theirs - ours).max() <= 2e-4 * scale, (n, m, d,
                                                         boundary, N)


def _design_rank_deficient(hx, hy, order) -> bool:
    from savgol_tpu.ops.weights import _design_matrix_np
    A = _design_matrix_np(hx, hy, order)
    An = A / np.linalg.norm(A, axis=0, keepdims=True)
    s = np.linalg.svd(An, compute_uv=False)
    return bool(s[-1] <= 1e-8 * s[0])


_CASES_2D = []
_rng2 = np.random.default_rng(0xF023)
while len(_CASES_2D) < 20:
    hx = int(_rng2.integers(1, 9))
    hy = int(_rng2.integers(1, 9))
    order = int(_rng2.integers(0, 7))
    terms = (order + 1) * (order + 2) // 2
    if (2 * hx + 1) * (2 * hy + 1) < terms:
        continue
    pool = [(dx, dy) for dx in range(order + 1) for dy in range(order + 1)
            if dx + dy <= order]
    dx, dy = pool[int(_rng2.integers(0, len(pool)))]
    boundary = _rng2.choice(list(sg.Boundary2D))
    rows = int(_rng2.integers(2 * hy + 1, 90))
    cols = int(_rng2.integers(2 * hx + 1, 110))
    _CASES_2D.append((hx, hy, order, dx, dy, boundary, rows, cols))


@pytest.mark.parametrize("hx,hy,order,dx,dy,boundary,rows,cols", _CASES_2D)
def test_three_way_parity_2d(ref, hx, hy, order, dx, dy, boundary, rows,
                             cols):
    img = np.random.default_rng(rows * 100 + cols).standard_normal(
        (rows, cols)).astype(np.float32)
    cfg = sg.Savgol2DConfig(hx, hy, order, deriv_x=dx, deriv_y=dy)
    try:
        f = sg.Savgol2D.create(cfg, dtype=F64)
    except np.linalg.LinAlgError:
        # ill-posed functional: the target coefficient mixes into the
        # design null space — adjudicated against exact rational
        # arithmetic. (The reference's unpivoted Cholesky may luck-factor
        # the singular system and return garbage, so its accept/reject
        # behavior here is rounding noise — nothing to compare.)
        from test_weights import illposed_2d_exact
        assert illposed_2d_exact(hx, hy, order, dx, dy)
        return
    ours = np.asarray(f.apply(jnp.asarray(img, dtype=F64),
                              boundary=boundary))
    scale = max(1.0, np.abs(ours).max())

    got_native = native.HostSavgol2D(cfg).apply(img, boundary)
    assert np.abs(got_native - ours).max() <= 4e-6 * scale

    if _design_rank_deficient(hx, hy, order):
        # rank-deficient but well-posed target (e.g. half_window=1 with
        # order 3 and a target outside the x^3==x ambiguity): our min-norm
        # weights are exact, but the reference's unpivoted Cholesky result
        # is luck-of-rounding — documented divergence, skip the comparison
        return
    if boundary is sg.Boundary2D.PERIODIC:
        # extension beyond the reference's 2D boundary set
        # (savgol2d.h:108-112) — no reference oracle; the native-engine
        # cross-check above is the independent implementation here
        return
    theirs = ref.apply2d(img, hx, hy, order, dx, dy,
                         boundary=boundary.name.lower())
    if theirs is None:
        return  # reference's stricter Cholesky refused an ill-conditioned
                # (but solvable) geometry — documented divergence
    assert np.abs(theirs - ours).max() <= 2e-4 * scale


_CASES_STREAM = []
_rng3 = np.random.default_rng(0xF024)
while len(_CASES_STREAM) < 10:
    n = int(_rng3.integers(1, 33))
    m = int(_rng3.integers(0, min(2 * n, 11)))
    d = int(_rng3.integers(0, min(m, 4) + 1))
    N = int(_rng3.integers(2 * n + 1, 800))
    _CASES_STREAM.append((n, m, d, N))


# ---- scipy-compat fuzz: random (window, order, deriv, mode, axis, delta) ---
# Samples the DROP-IN surface broadly, including the beyond-reference
# envelope (deriv > 4 exceeds the reference cap but scipy allows it —
# scipy_compat serves those through the direct Gram path). Oracle:
# scipy.signal.savgol_filter in f64 — but scipy's own lstsq weight
# construction drifts from the exact answer at high polyorder (adjudicated
# against the exact-rational oracle: at wl=25 po=10 pos=15.5 scipy is off
# 9.6e-6 relative while our Gram path is at 2e-16; at wl=27 po=8 edge rows
# scipy is 2e-8, ours 5e-16). The scipy comparison is therefore tight
# (1e-8) for po <= 7 and loose (1e-4, still catches wrong modes/axes/
# signs, which are O(1)) above; the coeffs fuzz below adjudicates failures
# against exact rationals instead of trusting either side.
_CASES_SCIPY = []
_rng4 = np.random.default_rng(0xF025)
while len(_CASES_SCIPY) < 25:
    wl = int(_rng4.integers(1, 21)) * 2 + 1             # odd, 3..41
    po = int(_rng4.integers(0, min(wl - 1, 10) + 1))
    d = int(_rng4.integers(0, po + 1))                  # incl. d > 4
    mode = str(_rng4.choice(
        ["interp", "mirror", "nearest", "wrap", "constant"]))
    ndim = int(_rng4.integers(1, 4))
    axis = int(_rng4.integers(0, ndim))
    delta = float(_rng4.choice([0.5, 1.0, 2.0]))
    cval = float(_rng4.uniform(-2.0, 2.0))
    N = int(_rng4.integers(wl, 300))
    _CASES_SCIPY.append((wl, po, d, mode, ndim, axis, delta, cval, N))


@pytest.mark.parametrize("wl,po,d,mode,ndim,axis,delta,cval,N", _CASES_SCIPY)
def test_scipy_compat_fuzz(wl, po, d, mode, ndim, axis, delta, cval, N):
    from scipy.signal import savgol_filter as sp_filter

    from savgol_tpu.scipy_compat import savgol_filter

    shape = [3] * ndim
    shape[axis] = N
    x = np.random.default_rng(wl * 7919 + N).standard_normal(tuple(shape))

    ours = np.asarray(savgol_filter(
        jnp.asarray(x, dtype=F64), wl, po, deriv=d, delta=delta,
        axis=axis, mode=mode, cval=cval))
    ref = sp_filter(x, wl, po, deriv=d, delta=delta, axis=axis,
                    mode=mode, cval=cval)
    scale = max(1.0, np.abs(ref).max())
    tol = 1e-8 if po <= 7 else 1e-4   # scipy's own drift at high order
    assert np.abs(ours - ref).max() <= tol * scale, (
        wl, po, d, mode, ndim, axis, delta, N)


_CASES_COEFFS = []
_rng5 = np.random.default_rng(0xF026)
while len(_CASES_COEFFS) < 15:
    wl = int(_rng5.integers(1, 21)) * 2 + 1
    po = int(_rng5.integers(0, min(wl - 1, 10) + 1))
    d = int(_rng5.integers(0, po + 1))
    # integer, half-integer and arbitrary-float positions
    pos = float(_rng5.choice([int(_rng5.integers(0, wl)),
                              int(_rng5.integers(0, wl - 1)) + 0.5,
                              float(_rng5.uniform(0, wl - 1e-9))]))
    use = str(_rng5.choice(["conv", "dot"]))
    _CASES_COEFFS.append((wl, po, d, pos, use))


@pytest.mark.parametrize("wl,po,d,pos,use", _CASES_COEFFS)
def test_scipy_coeffs_fuzz(wl, po, d, pos, use):
    from scipy.signal import savgol_coeffs as sp_coeffs

    from savgol_tpu.scipy_compat import savgol_coeffs

    ours = np.asarray(savgol_coeffs(wl, po, deriv=d, pos=pos, use=use))
    ref = sp_coeffs(wl, po, deriv=d, pos=pos, use=use)
    scale = max(1.0, np.abs(ref).max())
    if np.abs(ours - ref).max() <= 1e-8 * scale:
        return
    # Disagreement with scipy: adjudicate against the exact-rational
    # least-squares oracle (tests/test_weights.py). scipy's lstsq drifts
    # at high polyorder; OUR side must match the exact answer to f64
    # roundoff or this is a real bug.
    from fractions import Fraction

    from test_weights import exact_weights
    n = wl // 2
    ex = exact_weights(n, po, d, Fraction(pos) - n)
    if use == "conv":
        ex = ex[::-1]
    ex_scale = max(1.0, np.abs(ex).max())
    assert np.abs(ours - ex).max() <= 1e-12 * ex_scale, (
        f"{(wl, po, d, pos, use)}: ours vs exact "
        f"{np.abs(ours - ex).max():.3e}, scipy vs exact "
        f"{np.abs(ref - ex).max():.3e}")


@pytest.mark.parametrize("n,m,d,N", _CASES_STREAM)
def test_stream_three_way_parity(ref, n, m, d, N):
    """Streaming protocol fuzz: the JAX shell, the native stream engine,
    and the reference stream all emit the same sequence (conservation:
    outputs == inputs after flush), matching the batch apply."""
    x = np.random.default_rng(n * 31 + N).standard_normal(N)
    x = x.astype(np.float32)
    cfg = sg.SavgolConfig(n, m, d)

    theirs = ref.stream_run(x, n, m, d)

    # JAX shell and native stream default to the CORRECT leading-edge
    # sign; the reference stream emits the flipped one for odd d —
    # compare each against the matching-sign batch output.
    s = sg.SavgolStream(cfg)
    ours = [v for smp in x for v in s.push_full(float(smp))]
    ours = np.asarray(ours + list(s.flush()), dtype=np.float32)

    hs = native.HostSavgolStream(cfg)
    got = [v for smp in x for v in hs.push_full(float(smp))]
    got = np.asarray(got + list(hs.flush()), dtype=np.float32)

    engine = native.HostSavgol1D(cfg)
    batch = engine.apply(x)
    batch_refsign = engine.apply(x, reference_edge_sign=True)

    assert ours.size == N and got.size == N and len(theirs) == N
    scale = max(1.0, np.abs(batch).max())
    assert np.abs(got - batch).max() <= 4e-6 * scale
    assert np.abs(ours - batch).max() <= 4e-6 * scale
    assert np.abs(np.asarray(theirs) - batch_refsign).max() <= 2e-4 * scale
