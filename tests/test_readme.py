"""Docs-as-tests: the README quick-start block must execute verbatim.

Extracts the first ```python fence from README.md and runs it with the
illustrative free names (x, image, feed, ...) bound to real data — so the
advertised API surface can never drift from the implementation.
"""

import os
import re

import numpy as np
import jax.numpy as jnp

import savgol_tpu as sg

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def test_readme_quickstart_executes():
    text = open(README).read()
    m = re.search(r"```python\n(.*?)```", text, re.S)
    assert m, "README has no python quick-start fence"
    code = m.group(1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(5000), dtype=jnp.float32)
    ctx = {
        "x": x,
        "image": jnp.asarray(rng.standard_normal((96, 96)),
                             dtype=jnp.float32),
        "dt": 0.01,
        "feed": np.asarray(x[:150]),
        "chunk_iter": iter([np.asarray(x[:512]),
                            np.asarray(x[512:1024])]),
        "consume": lambda *a: None,
        "consume_many": lambda *a: None,
    }
    exec(compile(code, README, "exec"), ctx)  # noqa: S102 — docs-as-tests
