#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench step and print per-op timings.

First-class profiling subsystem (SURVEY.md §5: "Build: jax.profiler traces +
per-phase timing as first-class"). Usage:

    python scripts/profile_rasterizer.py [outdir]

Prints the top device ops by total self-time, grouped by fusion name, so
optimization is trace-driven instead of guesswork.
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
from wildgs_slam_tpu.ops.rasterizer import render_pallas as render  # noqa: E402

N_GAUSS = 5000
H, W = 240, 320


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    import bench

    means, scales, rots, opac, sh = bench.make_scene(jax.random.PRNGKey(0))
    w2c = lie.se3_identity()
    intr = jnp.array([260.0, 260.0, W / 2, H / 2])
    # trace the EXACT bench program (bench.py owns the loss/loop config)
    bench.ITERS = 10
    import importlib
    importlib.reload(bench)
    bench.ITERS = 10

    means, scales, rots, opac, sh = bench.make_scene(jax.random.PRNGKey(0))
    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))

    def loss_fn(means, scales, opac, pose_delta):
        out = render(means, scales, rots, opac, sh, w2c, intr, (H, W),
                     pose_delta=pose_delta, capacity=192, chunk=64)
        return jnp.mean((out.color - target) ** 2) + 0.01 * jnp.mean(
            out.depth ** 2)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))

    @jax.jit
    def bench_loop(means, scales, opac):
        def body(carry, _):
            means, scales, opac, acc = carry
            loss, (gm_, gs_, go_, gp_) = grad_fn(means, scales, opac,
                                                 jnp.zeros(6))
            return (means - 1e-6 * gm_, scales - 1e-6 * gs_,
                    opac - 1e-6 * go_, acc + loss + jnp.sum(gp_ ** 2)), None

        return jax.lax.scan(body, (means, scales, opac, jnp.float32(0)),
                            None, length=10)[0]

    out = bench_loop(means, scales, opac)
    jax.block_until_ready(out)

    with jax.profiler.trace(outdir):
        out = bench_loop(means, scales, opac)
        jax.block_until_ready(out)

    summarize(outdir)


def summarize(outdir):
    """Parse the xplane proto and print per-op totals."""
    import glob
    from collections import defaultdict

    xplanes = sorted(glob.glob(os.path.join(outdir, "**/*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        print("NO XPLANE FILES FOUND in", outdir)
        return
    xp = xplanes[-1]
    print("xplane:", xp)

    # Parse the raw xplane proto directly.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    with open(xp, "rb") as f:
        space = xplane_pb2.XSpace()
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"\n=== plane: {plane.name} ===")
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(totals.values())
        print(f"{'op':<72} {'ms':>9} {'n':>5} {'%':>6}")
        for name, ms in top:
            print(f"{name[:72]:<72} {ms:9.3f} {counts[name]:5d} "
                  f"{100 * ms / max(tot, 1e-9):6.1f}")
        print(f"TOTAL (all events, incl. nesting double-count): {tot:.3f} ms")


if __name__ == "__main__":
    main()
