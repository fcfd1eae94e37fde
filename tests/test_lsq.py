"""Shifted CholeskyQR3 batched LS solver (savgol_tpu/ops/lsq.py).

The solver exists so the masked / nonuniform QR-accuracy paths can run
on MXU-shaped matmuls instead of XLA's blocked Householder while keeping
Householder's forward-error class even on the ill-conditioned windows
the QR mode is FOR (hole-starved, down to exactly-determined). These
tests pin that claim against f64 ``numpy.linalg.lstsq`` ground truth.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from savgol_tpu.ops.lsq import cholqr_lstsq, sliding_windows
from savgol_tpu.ops.masked import _masked_tables


class TestSlidingWindows:
    def test_matches_gather(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((3, 40))
        got = np.asarray(sliding_windows(jnp.asarray(a), 7))
        idx = np.arange(34)[:, None] + np.arange(7)[None, :]
        np.testing.assert_array_equal(got, a[:, idx])

    def test_window_one(self):
        a = np.arange(5.0)
        got = np.asarray(sliding_windows(jnp.asarray(a), 1))
        np.testing.assert_array_equal(got, a[:, None])


class TestCholqrLstsq:
    def _problems(self, nvalid, ntrial, seed):
        """Random masked savgol designs: ws=25 quartic windows with only
        ``nvalid`` surviving rows — half scattered, half clustered at one
        end (the worst-conditioned case a hole can produce)."""
        rng = np.random.default_rng(seed)
        Q, _, _, _ = _masked_tables(12, 4)          # (25, 5) f64
        ws, k = Q.shape
        As, bs = [], []
        for i in range(ntrial):
            rows = np.zeros(ws)
            if i % 2:
                rows[:nvalid] = 1.0
            else:
                rows[rng.choice(ws, nvalid, replace=False)] = 1.0
            As.append(rows[:, None] * Q)
            bs.append(rng.standard_normal(ws) * rows)
        return np.stack(As), np.stack(bs)

    @pytest.mark.parametrize("nvalid,tol", [
        (5, 5e-3),    # exactly determined quartic: cond ~ 1e5
        (8, 5e-2),    # clustered: cond up to ~1e4, scale blows up
        (13, 1e-3),
        (25, 2e-5),
    ])
    def test_f32_matches_f64_lstsq(self, nvalid, tol):
        A64, b64 = self._problems(nvalid, 64, seed=nvalid)
        want = np.stack([np.linalg.lstsq(a, b, rcond=None)[0]
                         for a, b in zip(A64, b64)])
        coef, rdiag, finite = cholqr_lstsq(
            jnp.asarray(A64, jnp.float32), jnp.asarray(b64, jnp.float32))
        coef = np.asarray(coef)
        assert np.asarray(finite).all()
        scale = np.maximum(1.0, np.abs(want).max(axis=-1, keepdims=True))
        rel = np.abs(coef - want) / scale
        assert rel.max() < tol, rel.max()

    def test_f64_is_tight(self):
        A64, b64 = self._problems(9, 32, seed=7)
        want = np.stack([np.linalg.lstsq(a, b, rcond=None)[0]
                         for a, b in zip(A64, b64)])
        coef, _, finite = cholqr_lstsq(jnp.asarray(A64), jnp.asarray(b64))
        assert np.asarray(finite).all()
        scale = np.maximum(1.0, np.abs(want).max(axis=-1, keepdims=True))
        assert (np.abs(np.asarray(coef) - want) / scale).max() < 1e-11

    def test_identity_padding_passthrough(self):
        # under-quorum positions arrive as identity-padded designs; the
        # solver must stay finite there and report finite=True
        ws, k = 25, 5
        A = np.broadcast_to(np.eye(ws, k), (4, ws, k)).copy()
        b = np.zeros((4, ws))
        coef, rdiag, finite = cholqr_lstsq(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32))
        assert np.asarray(finite).all()
        np.testing.assert_allclose(np.asarray(coef), 0.0)
        np.testing.assert_allclose(np.asarray(rdiag), 1.0, rtol=1e-5)

    def test_rdiag_flags_rank_deficiency(self):
        # two identical columns -> collapsed diag(R) entry (the
        # identifiability signal the nonuniform path uses)
        rng = np.random.default_rng(3)
        A = rng.standard_normal((25, 3))
        A[:, 2] = A[:, 1]
        coef, rdiag, finite = cholqr_lstsq(
            jnp.asarray(A[None], jnp.float32),
            jnp.asarray(rng.standard_normal(25)[None], jnp.float32))
        r = np.asarray(rdiag)[0]
        assert (not bool(np.asarray(finite)[0])) or (
            r.min() < 1e-3 * r.max())

    def test_batched_shapes(self):
        rng = np.random.default_rng(4)
        A = rng.standard_normal((2, 3, 11, 4)).astype(np.float32)
        b = rng.standard_normal((2, 3, 11)).astype(np.float32)
        coef, rdiag, finite = cholqr_lstsq(jnp.asarray(A), jnp.asarray(b))
        assert coef.shape == (2, 3, 4)
        assert rdiag.shape == (2, 3, 4)
        assert finite.shape == (2, 3)

    def test_gradients_finite(self):
        import jax
        rng = np.random.default_rng(5)
        A = jnp.asarray(rng.standard_normal((4, 11, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((4, 11)), jnp.float32)

        def loss(A, b):
            coef, _, _ = cholqr_lstsq(A, b)
            return jnp.sum(coef ** 2)

        gA, gb = jax.grad(loss, argnums=(0, 1))(A, b)
        assert np.isfinite(np.asarray(gA)).all()
        assert np.isfinite(np.asarray(gb)).all()
