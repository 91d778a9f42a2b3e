#!/usr/bin/env python
"""Trace the REAL mapper optimization segment (_opt_segment) at full scale.

profile_mapping_raster.py traces the bare rasterize fwd+bwd; the pipeline
profile shows _opt_segment[K=64] costs ~76 ms/iter warm at 384x512 /
N=131072 / cap=512 — ~3x the bare rasterize. This script builds a Mapper on
a synthetic scene at exactly those shapes (test_mapper.py fixture recipe),
warms the K-bucket program, times warm segments, then traces one and prints
per-op totals so the extra ~50 ms/iter gets named (suspects: SSIM chain,
uncertainty MLP fwd/bwd, full-carry select at the scan tail, adam over
131k params, DINO-reg gathers).

Usage: python scripts/profile_map_opt.py [outdir] [K] [n_kf] [bin_method]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HT, WD = 384, 512


def textured_wall(t):
    y, x = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    img = np.stack([
        0.5 + 0.4 * np.sin(0.05 * x + t),
        0.5 + 0.4 * np.cos(0.04 * y),
        0.5 + 0.3 * np.sin(0.03 * (x + y)),
    ], -1).astype(np.float32)
    return np.clip(img, 0, 1)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_mapopt"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_kf = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    bin_method = sys.argv[4] if len(sys.argv) > 4 else None

    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.ops import lie
    from wildgs_slam_tpu.slam import keyframe_store as kstore
    from wildgs_slam_tpu.slam.mapper import Mapper
    from wildgs_slam_tpu.slam.state import SlamState

    cfg = load_config("configs/wildgs_slam.yaml")
    tr = cfg["mapping"]["Training"]
    tr["init_itr_num"] = K
    tr["mapping_itr_num"] = K
    tr["window_size"] = 8
    cfg["mapping"]["gaussian_capacity"] = 131072
    cfg["mapping"]["render_list_capacity"] = int(
        os.environ.get("PM_CAP", "512"))
    cfg["tracking"]["buffer"] = n_kf + 2
    if bin_method:
        cfg["mapping"]["bin_method"] = bin_method

    intr = np.array([WD * 1.2, WD * 1.2, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr,
                             buffer=cfg["tracking"]["buffer"])
    rng = np.random.RandomState(0)
    for i in range(n_kf):
        xi = np.zeros(6)
        xi[0] = 0.05 * i
        pose = lie.se3_exp(jnp.asarray(xi))
        depth = (2.0 + 0.3 * rng.rand(HT, WD)).astype(np.float32)
        state.store = kstore.append(
            state.store, i, float(i), pose=pose,
            disp=jnp.full((HT // 8, WD // 8), 0.5),
            mono_depth_up=jnp.asarray(depth))
        dino = rng.rand(HT // 14, WD // 14, 384).astype(np.float32)
        state.append_host(i, textured_wall(i), dino, float(i))

    mapper = Mapper(state, cfg, rng_seed=0)
    t0 = time.time()
    mapper.initialize_mapper(cur_video_idx=n_kf - 1)
    jax.block_until_ready(mapper.gaussians.params.xyz)
    import wildgs_slam_tpu.slam.gaussian_map as gm

    print(f"[mapopt] init {time.time() - t0:.1f}s  alive="
          f"{int(gm.num_alive(mapper.gaussians))}", flush=True)

    # warm + time the online segment at the K bucket
    t0 = time.time()
    mapper.map_opt_online(mapper.current_window, iters=K)
    jax.block_until_ready(mapper.gaussians.params.xyz)
    print(f"[mapopt] first online segment ({K} it) {time.time() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        mapper.map_opt_online(mapper.current_window, iters=K)
        jax.block_until_ready(mapper.gaussians.params.xyz)
        best = min(best, time.time() - t0)
    print(f"[mapopt] warm segment: {best:.2f}s = {best / K * 1e3:.1f} ms/iter"
          f"  (bin_method={mapper.bin_method})", flush=True)

    with jax.profiler.trace(outdir):
        mapper.map_opt_online(mapper.current_window, iters=K)
        jax.block_until_ready(mapper.gaussians.params.xyz)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_rasterizer import summarize
    summarize(outdir)


if __name__ == "__main__":
    main()
