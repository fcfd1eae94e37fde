"""Sweep-path attribution probe (VERDICT r2 #7).

The 6-config sweep bench sits at ~1.1-1.2 Gs/s/config on 131k samples
while the static path does ~30 Gs/s — per-config MXU work is n-independent
(K=256-quantized bands), so the gap must be fixed per-invocation cost.
This probe splits the sweep into its three stages and chains each on
device (sum-feedback, k-scaling checked implicitly by comparing stages):

  full        savgol_apply_sweep as benched (weights + conv + edge fix)
  weights     masked weight generation only (vmapped savgol_weights_masked)
  conv+fix    the correlation + edge fix with the (C, 65) weight tensors
              passed in as device arrays (weight gen excluded)
  conv        correlation only (vmapped correlate_valid_mxu, no edge fix)

Also sweeps the input length (131k / 1M) to separate fixed overhead from
per-sample cost.

Run ON TPU:  python benchmarks/probe_sweep.py [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from savgol_tpu.config import BoundaryMode
from savgol_tpu.ops.sweep import (_M, _apply_sweep_jit, savgol_apply_sweep,
                                  savgol_weights_masked)


def _t_chain(fn, x, iters=5, k=8):
    """Chained on-device timing: scan k bodies, feed the (reduced) output
    back into the next input so the stack cannot elide bodies."""
    def chained(v):
        def body(carry, _):
            return fn(carry), None
        out, _ = jax.lax.scan(body, v, None, length=k)
        return out

    cf = jax.jit(chained)
    out = cf(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = cf(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(4)
    ns = jnp.asarray([4, 8, 12, 16, 24, 32])
    ms = jnp.asarray([2, 3, 4, 4, 5, 6])
    C = ns.shape[0]

    for N in (131_072, 1_048_576):
        xs = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

        def full(v):
            y = savgol_apply_sweep(v, ns, ms)
            return y.sum(axis=0) * 1e-3 + v

        t_full = _t_chain(full, xs, iters=args.iters)

        def weights_only(v):
            c, l, t = jax.vmap(
                lambda n, m: savgol_weights_masked(n, m, 0, jnp.float32)
            )(ns, ms)
            # fold a data-dependent scalar in so the chain can't hoist
            # the weight computation out of the scan
            s = v[0] * 1e-20
            return v + (c.sum() + l.sum() + t.sum()) * 1e-9 + s

        t_w = _t_chain(weights_only, xs, iters=args.iters)

        # conv (+ edge fix) with weights as data: excludes generation
        cw, lw, tw = jax.jit(jax.vmap(
            lambda n, m: savgol_weights_masked(n, m, 0, jnp.float32)
        ))(ns, ms)

        from savgol_tpu.ops.apply import correlate_valid_mxu

        def conv_only(v, center):
            xp = jnp.pad(v, (_M, _M))
            y = jax.vmap(lambda w: correlate_valid_mxu(xp, w))(center)
            return y.sum(axis=0) * 1e-3 + v

        t_conv = _t_chain(functools.partial(conv_only, center=cw), xs,
                          iters=args.iters)

        gs = lambda t: C * N / t / 1e9
        print(f"N={N}:")
        print(f"  full      {t_full * 1e6:9.1f} us  "
              f"{gs(t_full):6.2f} Gs/s/agg ({gs(t_full) / C:5.2f}/cfg)")
        print(f"  weights   {t_w * 1e6:9.1f} us")
        print(f"  conv-only {t_conv * 1e6:9.1f} us  {gs(t_conv):6.2f} "
              "Gs/s/agg")
        resid = t_full - t_w - t_conv
        print(f"  residual (edge fix + glue) {resid * 1e6:9.1f} us")


if __name__ == "__main__":
    main()
