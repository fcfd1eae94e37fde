"""Profiling utility smoke tests."""

import jax.numpy as jnp
import numpy as np

from savgol_tpu.utils.profiling import benchmark, trace


def test_benchmark_helper():
    secs, out = benchmark(lambda v: v * 2.0, jnp.ones(128), iters=3,
                          warmup=1)
    assert secs > 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "tr")):
        jnp.ones(8).sum().block_until_ready()
    # a trace directory must have been produced
    assert any((tmp_path / "tr").rglob("*"))
