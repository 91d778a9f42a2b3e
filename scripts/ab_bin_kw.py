#!/usr/bin/env python
"""Qualify the sort-binning bbox window (bin_kw) at REAL radius
distributions (VERDICT r2 next-step 3): build the profile_map_opt mapper
scene, densify through real online segments, then A/B kw=4/3/2 renders
(overflow + color/depth deltas vs kw=4) and time the opt segment at the
candidate kw.

Usage: python scripts/ab_bin_kw.py [K]
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

import jax.numpy as jnp
import numpy as np

HT, WD = 384, 512


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.ops import lie
    from wildgs_slam_tpu.ops.rasterizer.projection import project_gaussians
    from wildgs_slam_tpu.slam import gaussian_map as gm
    from wildgs_slam_tpu.slam import keyframe_store as kstore
    from wildgs_slam_tpu.slam.mapper import Mapper, _fast_render
    from wildgs_slam_tpu.slam.state import SlamState
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_map_opt import textured_wall

    n_kf = 8
    cfg = load_config("configs/wildgs_slam.yaml")
    tr = cfg["mapping"]["Training"]
    tr["init_itr_num"] = K
    tr["mapping_itr_num"] = K
    tr["window_size"] = 8
    cfg["mapping"]["gaussian_capacity"] = 131072
    cfg["mapping"]["render_list_capacity"] = 512
    cfg["tracking"]["buffer"] = n_kf + 2

    intr = np.array([WD * 1.2, WD * 1.2, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr, buffer=n_kf + 2)
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
    mapper.initialize_mapper(cur_video_idx=n_kf - 1)
    mapper.map_opt_online(mapper.current_window, iters=K)
    jax.block_until_ready(mapper.gaussians.params.xyz)
    alive = mapper.gaussians.aux.alive
    print(f"[kw] alive={int(gm.num_alive(mapper.gaussians))}", flush=True)

    p = mapper.gaussians.params
    w2c = state.store.poses[n_kf // 2]
    intrf = mapper.intrinsics_full

    # real radius distribution
    proj = jax.jit(lambda: project_gaussians(
        p.xyz, gm.get_scaling(p), gm.get_rotation_xyzw(p), gm.get_opacity(p),
        gm.get_sh(p), w2c, intrf, (HT, WD)))()
    rad = np.asarray(proj.radius)[np.asarray(proj.valid & alive)]
    print(f"[kw] radius px: p50={np.percentile(rad,50):.1f} "
          f"p95={np.percentile(rad,95):.1f} p99={np.percentile(rad,99):.1f} "
          f"p99.9={np.percentile(rad,99.9):.1f} max={rad.max()}", flush=True)

    outs = {}
    for kw in (4, 3, 2):
        out = jax.jit(lambda kw=kw: _fast_render(
            p.xyz, gm.get_scaling(p), gm.get_rotation_xyzw(p),
            gm.get_opacity(p), gm.get_sh(p), w2c, intrf, (HT, WD),
            alive=alive, capacity=512, chunk=64, bin_method="sort",
            bin_kw=kw))()
        jax.block_until_ready(out.color)
        outs[kw] = out
        if kw == 4:
            print(f"[kw] kw=4: overflow={int(out.overflow)}", flush=True)
        else:
            ref = outs[4]
            dc = float(jnp.abs(out.color - ref.color).max())
            dd = float(jnp.abs(out.depth - ref.depth).max())
            mse = float(jnp.mean((out.color - ref.color) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-20))
            print(f"[kw] kw={kw}: overflow={int(out.overflow)} "
                  f"max|dcolor|={dc:.2e} max|ddepth|={dd:.2e} "
                  f"PSNR-vs-kw4={psnr:.1f} dB", flush=True)

    # timing at the candidate kw
    for kw in (4, 3):
        mapper.bin_kw = kw
        mapper.loss_cfg["bin_kw"] = kw
        mapper.map_opt_online(mapper.current_window, iters=K)  # compile
        jax.block_until_ready(mapper.gaussians.params.xyz)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            mapper.map_opt_online(mapper.current_window, iters=K)
            jax.block_until_ready(mapper.gaussians.params.xyz)
            best = min(best, time.time() - t0)
        print(f"[kw] opt segment kw={kw}: {best / K * 1e3:.1f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
