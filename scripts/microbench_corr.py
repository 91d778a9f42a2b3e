#!/usr/bin/env python
"""A/B the corr_lookup window-sampling methods at tracking scale.

The frontend's jitted update spends its corr time in 4 levels of
per-pixel 7x7-window bilinear sampling from (E, HW, h2, w2) volumes
(reference kernel: correlation_kernels.cu:31-135). Three numerically
equivalent TPU lowerings are compared (ops/correlation.py):
gather (take_along_axis), onehot (MXU select-reduce), patch (vmapped
dynamic_slice on a padded volume).

Methodology per PERF.md: N data-dependent iterations inside ONE scan,
every output folded into the carry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

E = int(os.environ.get("CB_EDGES", "64"))
H = int(os.environ.get("CB_H", "48"))
W = int(os.environ.get("CB_W", "64"))
ITERS = int(os.environ.get("CB_ITERS", "100"))


def main():
    from wildgs_slam_tpu.ops import correlation as C

    print(f"[cb] backend={jax.default_backend()} E={E} {H}x{W}", flush=True)
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, H, W, 128).astype(np.float32)) * 0.5
    f2 = jnp.asarray(rng.randn(E, H, W, 128).astype(np.float32)) * 0.5
    pyr = [p.astype(jnp.bfloat16) for p in C.corr_pyramid(f1, f2)]
    coords0 = jnp.asarray(
        rng.uniform(0, min(H, W), size=(E, H, W, 2)).astype(np.float32))

    for method in os.environ.get("CB_METHODS", "onehot,patch").split(","):

        @jax.jit
        def loop(coords, acc):
            def body(c, _):
                coords, acc = c
                out = C.corr_lookup(pyr, coords, method=method)
                # data-dependent next coords; consume out (no DCE)
                coords = coords + 1e-3 * out[..., :2]
                return (coords, acc + jnp.sum(out)), None

            (coords, acc), _ = jax.lax.scan(body, (coords, acc), None,
                                            length=ITERS)
            return coords, acc

        out = loop(coords0, jnp.float32(0))
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(coords0, jnp.float32(0))
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"[cb] {method:7s}: {best / ITERS * 1e3:8.2f} ms/lookup "
              f"(acc={float(out[1]):.3e})", flush=True)


if __name__ == "__main__":
    main()
