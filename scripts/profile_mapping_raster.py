#!/usr/bin/env python
"""Trace the rasterize fwd+bwd at MAPPING scale (the map.opt_segment hot op).

profile_rasterizer.py traces bench.py's 240x320/N=5k config; this traces the
shapes the real mapper runs at 384x512 (profile_pipeline.py): N=131072
gaussians, 768 tiles, render_list_capacity=512, bin_method='sort' (the
mapper default at this scale). Prints per-op totals from the xplane proto.

Usage: python scripts/profile_mapping_raster.py [outdir] [bin_method]
"""

import os
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from wildgs_slam_tpu.ops import lie  # noqa: E402
from wildgs_slam_tpu.ops.rasterizer import render_pallas  # noqa: E402

N = 131072
H, W = 384, 512
CAP = 512
ITERS = 5


def make_scene(key):
    ks = jax.random.split(key, 6)
    f = 520.0
    px = jax.random.uniform(ks[0], (N,)) * W
    py = jax.random.uniform(ks[1], (N,)) * H
    z = 1.0 + jax.random.uniform(ks[2], (N,)) * 4.0
    means = jnp.stack([(px - W / 2) * z / f, (py - H / 2) * z / f, z], -1)
    scales = 0.002 + 0.008 * jax.random.uniform(ks[3], (N, 3))
    rots = jax.random.normal(ks[4], (N, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[5], (N,)) * 0.8 + 0.1
    sh = jax.random.uniform(ks[0], (N, 1, 3))
    return means, scales, rots, opac, sh, jnp.array([f, f, W / 2, H / 2])


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_map"
    method = sys.argv[2] if len(sys.argv) > 2 else "sort"
    means, scales, rots, opac, sh, intr = make_scene(jax.random.PRNGKey(0))
    w2c = lie.se3_identity()
    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))

    def loss_fn(means, scales, opac, pose_delta):
        out = render_pallas(means, scales, rots, opac, sh, w2c, intr, (H, W),
                            pose_delta=pose_delta, capacity=CAP, chunk=64,
                            bin_method=method)
        return (jnp.mean((out.color - target) ** 2)
                + 0.01 * jnp.mean(out.depth ** 2)), out.overflow

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)

    @jax.jit
    def loop(means, scales, opac):
        def body(carry, _):
            means, scales, opac, acc = carry
            (loss, ovf), (gm_, gs_, go_, gp_) = grad_fn(means, scales, opac,
                                                        jnp.zeros(6))
            return (means - 1e-7 * gm_, scales - 1e-7 * gs_,
                    opac - 1e-7 * go_,
                    acc + loss + jnp.sum(gp_ ** 2)
                    + ovf.astype(jnp.float32) * 1e-12), None

        return jax.lax.scan(body, (means, scales, opac, jnp.float32(0)),
                            None, length=ITERS)[0]

    import time
    out = loop(means, scales, opac)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(means, scales, opac)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"[map-raster] method={method} {best / ITERS * 1e3:.2f} ms/iter "
          f"({H * W * ITERS / best / 1e6:.1f} Mrays/s)")

    with jax.profiler.trace(outdir):
        out = loop(means, scales, opac)
        jax.block_until_ready(out)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_rasterizer import summarize
    summarize(outdir)


if __name__ == "__main__":
    main()
