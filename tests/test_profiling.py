"""Profiling utility smoke tests."""

import jax.numpy as jnp
import numpy as np

from savgol_tpu.utils.profiling import benchmark, benchmark_chained, trace


def test_benchmark_helper():
    secs, out = benchmark(lambda v: v * 2.0, jnp.ones(128), iters=3,
                          warmup=1)
    assert secs > 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_benchmark_chained_same_shape():
    """The chained k-difference protocol runs and reports its ratio and
    the k-chain executable (for HLO inspection)."""
    w = jnp.asarray(np.random.default_rng(0).standard_normal((32, 32)),
                    jnp.float32)
    x = jnp.ones((32, 256), jnp.float32)
    per, ratio, ck = benchmark_chained(lambda v: jnp.tanh(w @ v), x,
                                       iters=2, k=4, return_info=True)
    assert isinstance(per, float) and isinstance(ratio, float)
    assert "tanh" in ck.as_text() or "call" in ck.as_text()


def test_benchmark_chained_geometry_feedback():
    """A VALID-style body (shrinking output) works with an explicit
    re-padding feedback."""
    def fn(v):
        return v[:, 2:-2] * 0.5

    def fb(y, template):
        return jnp.pad(y, ((0, 0), (2, 2))).astype(template.dtype)

    per = benchmark_chained(fn, jnp.ones((8, 128), jnp.float32),
                            iters=2, k=4, feedback=fb)
    assert isinstance(per, float)


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "tr")):
        jnp.ones(8).sum().block_until_ready()
    # a trace directory must have been produced
    assert any((tmp_path / "tr").rglob("*"))
