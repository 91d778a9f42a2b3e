#!/usr/bin/env python
"""Microbench: strategies for the tile-table gather (T*K rows from (N,F)).

The round-2 trace showed the XLA gathers feeding the Pallas composite kernel
(plus their scatter-add VJPs) cost ~4.3ms of the 7.2ms bench step. Compare:
  a) 5 separate per-array gathers (current render_pallas)
  b) one packed (N,16) gather
  c) Pallas row-gather kernel (attrs resident in VMEM, serial row copies)
each fwd-only and fwd+bwd (scatter-add VJP).
"""

import functools
import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 5000
T, K, F = 300, 256, 16


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    attrs = jax.random.normal(key, (N, F))
    cols = [attrs[:, i * 3:(i + 1) * 3] for i in range(3)] + [
        attrs[:, 9], attrs[:, 10]]
    ids = jax.random.randint(jax.random.PRNGKey(1), (T, K), 0, N)

    @jax.jit
    def gather_multi(c0, c1, c2, c3, c4, ids):
        return [c[ids] for c in (c0, c1, c2, c3, c4)]

    @jax.jit
    def gather_packed(attrs, ids):
        return attrs[ids]

    @jax.jit
    def gather_multi_grad(c0, c1, c2, c3, c4, ids):
        def f(*cs):
            outs = [c[ids] for c in cs]
            return sum(jnp.sum(o ** 2) for o in outs)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(c0, c1, c2, c3, c4)

    @jax.jit
    def gather_packed_grad(attrs, ids):
        def f(a):
            return jnp.sum(a[ids] ** 2)
        return jax.grad(f)(attrs)

    # --- pallas row-gather ---
    def _gather_kernel(ids_ref, attrs_ref, out_ref, *, rows_per_step):
        step = pl.program_id(0)
        for r in range(rows_per_step):
            row = step * rows_per_step + r
            t = row // K
            k = row % K
            idx = ids_ref[t, k]
            out_ref[r, :] = attrs_ref[idx, :]

    ROWS = 512

    @jax.jit
    def gather_pallas(attrs, ids):
        n_rows = T * K
        grid = n_rows // ROWS
        return pl.pallas_call(
            functools.partial(_gather_kernel, rows_per_step=ROWS),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec((N, F), lambda s, ids: (0, 0))],
                out_specs=pl.BlockSpec((ROWS, F), lambda s, ids: (s, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_rows, F), jnp.float32),
        )(ids, attrs)

    # pallas scatter-add (the VJP direction): accumulate rows into (N, F)
    def _scatter_kernel(ids_ref, g_ref, out_ref, *, rows_per_step, grid):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for r in range(rows_per_step):
            row = step * rows_per_step + r
            t = row // K
            k = row % K
            idx = ids_ref[t, k]
            out_ref[idx, :] += g_ref[r, :]

    @jax.jit
    def scatter_pallas(g, ids):
        n_rows = T * K
        grid = n_rows // ROWS
        return pl.pallas_call(
            functools.partial(_scatter_kernel, rows_per_step=ROWS, grid=grid),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec((ROWS, F), lambda s, ids: (s, 0))],
                out_specs=pl.BlockSpec((N, F), lambda s, ids: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        )(ids, g)

    print("gather_multi fwd      %.3f ms" % timeit(gather_multi, *cols, ids))
    print("gather_packed fwd     %.3f ms" % timeit(gather_packed, attrs, ids))
    print("gather_multi fwd+bwd  %.3f ms" % timeit(gather_multi_grad, *cols, ids))
    print("gather_packed fwd+bwd %.3f ms" % timeit(gather_packed_grad, attrs, ids))
    try:
        out = gather_pallas(attrs, ids)
        ref = attrs[ids].reshape(T * K, F)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
        print("gather_pallas fwd     %.3f ms (correct)" %
              timeit(gather_pallas, attrs, ids))
    except Exception as e:
        print("gather_pallas FAILED:", repr(e)[:300])
    try:
        g = jax.random.normal(jax.random.PRNGKey(2), (T * K, F))
        out = scatter_pallas(g, ids)
        ref = jnp.zeros((N, F)).at[ids.reshape(-1)].add(g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        print("scatter_pallas        %.3f ms (correct)" %
              timeit(scatter_pallas, g, ids))
    except Exception as e:
        print("scatter_pallas FAILED:", repr(e)[:300])


if __name__ == "__main__":
    main()
