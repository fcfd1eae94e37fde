"""Driver-contract regression tests: entry() compiles single-chip and
dryrun_multichip exercises the full sharded train step on the mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge


class TestEntry:
    def test_entry_jits_and_runs(self):
        fn, args = ge.entry()
        y = jax.jit(fn)(*args)
        assert y.shape == args[0].shape
        assert np.isfinite(np.asarray(y)).all()

    def test_entry_deterministic(self):
        fn, args = ge.entry()
        a = np.asarray(jax.jit(fn)(*args))
        b = np.asarray(jax.jit(fn)(*args))
        np.testing.assert_array_equal(a, b)


class TestDryrunMultichip:
    @pytest.mark.parametrize("n", [1, 2, 4, 8])
    def test_dryrun(self, n):
        if len(jax.devices()) < n:
            pytest.skip("not enough virtual devices")
        ge.dryrun_multichip(n)
