#!/usr/bin/env python
"""Trace the bench-scale binning call to attribute its ~0.7 ms/call."""

import os
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from wildgs_slam_tpu.ops import lie  # noqa: E402
from wildgs_slam_tpu.ops.rasterizer import binning as B  # noqa: E402
from wildgs_slam_tpu.ops.rasterizer import projection  # noqa: E402

H, W = bench.H, bench.W
METHOD = os.environ.get("TB_METHOD", "onehot2")
SEG = int(os.environ.get("TB_SEG", "32"))
CAP = int(os.environ.get("TB_CAP", "192"))


def main():
    means, scales, rots, opac, sh = bench.make_scene(jax.random.PRNGKey(0))
    w2c = lie.se3_identity()
    intr = jnp.array([260.0, 260.0, W / 2, H / 2])
    proj = projection.project_gaussians(means, scales, rots, opac, sh, w2c,
                                        intr, (H, W))

    @jax.jit
    def loop(m):
        def body(carry, _):
            m, acc = carry
            bins = B.bin_gaussians(m, proj.radius, proj.depth, proj.valid,
                                   (H, W), capacity=CAP, method=METHOD,
                                   seg_cap=SEG, with_rev=False)
            acc = acc + bins.counts.sum() + bins.ids.sum() + bins.overflow
            return (m + 1e-12 * acc, acc), None

        return jax.lax.scan(body, (m, jnp.float32(0)), None, length=20)[0]

    out = loop(proj.mean2d)
    jax.block_until_ready(out)
    outdir = "/tmp/jaxtrace_bin"
    with jax.profiler.trace(outdir):
        jax.block_until_ready(loop(proj.mean2d))

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from profile_rasterizer import summarize
    summarize(outdir)


if __name__ == "__main__":
    main()
