#!/usr/bin/env python
"""A/B the bf16 digit-split onehot compaction vs fp32, at bench scale.

Checks exactness (ids/counts equality vs the fp32 einsum path) and times
bin_gaussians inside one scanned jit (the only reliable harness over the
tunnel — see PERF.md methodology traps). Also reports the max per-tile
count at bench scale to qualify a lower CAPACITY.
"""

import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from wildgs_slam_tpu.ops import lie  # noqa: E402
from wildgs_slam_tpu.ops.rasterizer import binning, projection  # noqa: E402

H, W = bench.H, bench.W


def main():
    means, scales, rots, opac, sh = bench.make_scene(jax.random.PRNGKey(0))
    w2c = lie.se3_identity()
    intr = jnp.array([260.0, 260.0, W / 2, H / 2])
    proj = projection.project_gaussians(means, scales, rots, opac, sh, w2c,
                                        intr, (H, W))

    import wildgs_slam_tpu.ops.rasterizer.binning as B

    def run(method, seg, cap, force_fp32=False):
        if force_fp32:
            # disable the bf16 branch by lying about the backend
            orig = jax.default_backend
            jax.default_backend = lambda: "cpu"
        try:
            bins = jax.jit(lambda m, r, d, v: B.bin_gaussians(
                m, r, d, v, (H, W), capacity=cap, method=method,
                seg_cap=seg, with_rev=False))(
                    proj.mean2d, proj.radius, proj.depth, proj.valid)
            jax.block_until_ready(bins)
        finally:
            if force_fp32:
                jax.default_backend = orig
        return bins

    b_bf = run("onehot2", 32, 192)
    b_f32 = run("onehot2", 32, 192, force_fp32=True)
    same_ids = bool(jnp.all(b_bf.ids == b_f32.ids))
    same_cnt = bool(jnp.all(b_bf.counts == b_f32.counts))
    print("bf16==fp32 ids:", same_ids, "counts:", same_cnt,
          "maxcount:", int(b_bf.counts.max()),
          "overflow:", int(b_bf.overflow))
    assert same_ids and same_cnt

    # timing: N scanned data-dependent calls inside one jit
    def timeit(method, seg, cap, iters=50):
        @jax.jit
        def loop(m):
            def body(carry, _):
                m, acc = carry
                bins = B.bin_gaussians(m, proj.radius, proj.depth, proj.valid,
                                       (H, W), capacity=cap, method=method,
                                       seg_cap=seg, with_rev=False)
                # consume all outputs (DCE trap)
                acc = (acc + bins.counts.sum() + bins.ids.sum()
                       + bins.overflow)
                return (m + 1e-12 * acc, acc), None

            return jax.lax.scan(body, (m, jnp.float32(0)), None,
                                length=iters)[0]

        out = loop(proj.mean2d)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(proj.mean2d))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    for method, seg, cap in [("onehot2", 32, 192), ("onehot2", 32, 128),
                             ("onehot", 32, 192), ("onehot2", 16, 192)]:
        ms = timeit(method, seg, cap)
        print(f"{method} seg={seg} cap={cap}: {ms:.3f} ms/call")


if __name__ == "__main__":
    main()
