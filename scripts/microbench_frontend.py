#!/usr/bin/env python
"""Warm-steady-state microbench of the frontend's jitted update core.

Builds a factor graph at full tracking resolution (feature maps H/8 x W/8
of a 384x512 input by default) with a bucketed edge count, then times
_update_core warm (scanned repeats are impossible here — the call mutates
fixed-capacity storage through the host — so we time K back-to-back
dispatches after a warmup call). Optionally captures an xplane trace.

Usage: python scripts/microbench_frontend.py [--h 384 --w 512 --edges 48]
"""

import argparse
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--edges", type=int, default=48)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trace_dir", type=str, default="")
    args = ap.parse_args()

    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.models import droid_net
    from wildgs_slam_tpu.slam.factor_graph import FactorGraph
    from wildgs_slam_tpu.slam.motion_filter import MotionFilter
    from wildgs_slam_tpu.slam.state import SlamState

    HT, WD = args.h, args.w
    print(f"[mb] backend={jax.default_backend()} image {HT}x{WD} "
          f"features {HT // 8}x{WD // 8}", flush=True)

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["tracking"]["buffer"] = args.frames + 2
    intr = np.array([WD * 1.2, WD * 1.2, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr,
                             buffer=cfg["tracking"]["buffer"])
    params = droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)

    rng = np.random.RandomState(0)
    y, x = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")

    def synth_image(t):
        img = np.stack([
            0.5 + 0.5 * np.sin(0.05 * (x - 4 * t)),
            0.5 + 0.5 * np.cos(0.04 * (y + 3 * t)),
            0.5 + 0.4 * np.sin(0.03 * (x + y - 2 * t)),
        ], -1).astype(np.float32)
        return np.clip(img, 0, 1)

    t0 = time.time()
    mf = MotionFilter(state, params, thresh=-1.0,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    for t in range(args.frames):
        mf.track(float(t), synth_image(t))
    print(f"[mb] {args.frames} keyframes ingested in {time.time() - t0:.1f}s",
          flush=True)

    g = FactorGraph(state, params, max_factors=args.edges, pmax=96)
    t0 = time.time()
    g.add_neighborhood_factors(0, args.frames, r=2)
    print(f"[mb] E={g.E} edges added (corr pyramid built) in "
          f"{time.time() - t0:.1f}s", flush=True)

    # warmup (compile)
    t0 = time.time()
    g.update(None, None, use_inactive=True)
    jax.block_until_ready(g.state.store.poses)
    print(f"[mb] first update (compile+run) {time.time() - t0:.1f}s",
          flush=True)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        g.update(None, None, use_inactive=True)
        jax.block_until_ready(g.state.store.poses)
        times.append(time.time() - t0)
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"[mb] trace written to {args.trace_dir}", flush=True)

    print(f"[mb] warm update: min {min(times) * 1e3:.1f}ms  "
          f"mean {np.mean(times) * 1e3:.1f}ms  over {args.reps} reps")
    print(f"[mb] per-frame frontend cost at 12 updates/frame: "
          f"{12 * min(times):.2f}s")


if __name__ == "__main__":
    main()
