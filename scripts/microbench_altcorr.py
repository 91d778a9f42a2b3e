#!/usr/bin/env python
"""A/B the alt_corr (global-BA on-the-fly correlation) lowerings at
backend scale.

update_lowmem's GRU chunks call alt_corr per edge chunk (the reference's
altcorr_kernel.cu:39-300 role). Two numerically equal lowerings
(ops/correlation.py):

  gather     — dot(f1, bilin-gathered f2 patches): E·HW·(rd+1)² lane-dim
               take_along_axis row queries per level (the suspected
               global-BA hotspot, VERDICT r4 weak-1)
  vol_onehot — on-the-fly (E, HW, h2, w2) volume as one MXU contraction +
               one-hot window select-reduce, lax.map'd over 8-edge
               sub-chunks to bound the transient

Methodology per PERF.md: N data-dependent iterations inside ONE scan,
every output folded into the carry; sweep ITERS to separate the fixed
~25 ms dispatch sync from the steady-state cost.
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

E = int(os.environ.get("AB_EDGES", "64"))
F = int(os.environ.get("AB_FRAMES", "24"))
H = int(os.environ.get("AB_H", "48"))
W = int(os.environ.get("AB_W", "64"))
ITERS = int(os.environ.get("AB_ITERS", "20"))


def main():
    from wildgs_slam_tpu.ops import correlation as C

    print(f"[ab] backend={jax.default_backend()} E={E} F={F} {H}x{W} "
          f"iters={ITERS}", flush=True)
    rng = np.random.RandomState(0)
    fmaps = jnp.asarray(rng.randn(F, H, W, 128).astype(np.float32)) * 0.5
    pyr = C.fmap_pyramid(fmaps)
    ii = jnp.asarray(rng.randint(0, F, size=E))
    jj = jnp.asarray(rng.randint(0, F, size=E))
    coords0 = jnp.asarray(
        rng.uniform(0, min(H, W), size=(E, H, W, 2)).astype(np.float32))

    for method in os.environ.get("AB_METHODS",
                                 "vol_onehot,gather").split(","):

        @jax.jit
        def loop(coords, acc):
            def body(c, _):
                coords, acc = c
                out = C.alt_corr(pyr, coords, ii, jj, method=method)
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
        print(f"[ab] {method:10s}: {best / ITERS * 1e3:8.2f} ms/call "
              f"(acc={float(out[1]):.3e})", flush=True)


if __name__ == "__main__":
    main()
