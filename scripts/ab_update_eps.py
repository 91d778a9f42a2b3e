#!/usr/bin/env python
"""Qualify tracking.frontend.update_eps (VERDICT r4 item 7).

update_eps early-exits batched graph updates once the mean flow correction
drops below eps px (factor_graph._update_core cond; oracle analogue in
_update_n_oracle). This A/B runs the full integrated pipeline (SLAM.run on
the view-consistent oracle-geometry scene from tests/test_integrated_ate.py)
at eps in {0, 0.01, 0.05} and reports keyframe ATE + graph-update BA steps
executed. CPU; run from repo root:

    JAX_PLATFORMS=cpu python scripts/ab_update_eps.py

Caveat recorded in PERF.md: trained droid.pth cannot be fetched in this
container (egress blocked), so the GRU-path eps cannot be validated against
real flow predictions — the oracle-target A/B bounds the BA-convergence
side of the knob; the default stays 0 (reference schedule).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

from wildgs_slam_tpu.utils.jax_setup import host_fingerprint  # noqa: E402

# host-ISA-keyed like conftest/setup_compile_cache: foreign XLA:CPU AOT
# entries are a SIGILL hazard when the container migrates between hosts
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache_cpu_{host_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def run_once(eps, root, outdir):
    import test_integrated_ate as T
    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.slam.system import SLAM
    from wildgs_slam_tpu.utils.datasets import get_dataset
    from wildgs_slam_tpu.ops import lie

    c2w7 = T.gt_trajectory(T.N_FRAMES)
    w2c7 = jnp.stack([lie.se3_inv(p) for p in c2w7])
    if not os.path.exists(os.path.join(root, "rgb.txt")):
        T.write_scene(root, c2w7)

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["scene"] = f"eps{eps}"
    cfg["dataset"] = "tumrgbd"
    cfg["data"]["input_folder"] = root
    cfg["data"]["output"] = outdir
    H, W = T.H, T.W
    cfg["cam"].update(H=H * 2, W=W * 2, fx=90.0, fy=90.0, cx=W * 1.0,
                      cy=H * 1.0, H_out=H, W_out=W, H_edge=0, W_edge=0)
    cfg["fast_mode"] = True
    t = cfg["tracking"]
    t["buffer"] = 24
    t["warmup"] = 4
    t["force_keyframe_every_n_frames"] = 1
    t["motion_filter"]["thresh"] = 1e9
    t["backend"]["metric_depth_reg"] = False
    t["uncertainty_params"]["activate"] = False
    cfg["mapping"]["uncertainty_params"]["activate"] = False
    t["frontend"].update(window=6, max_factors=32, enable_loop=True,
                         update_eps=eps)
    t["backend"]["ba_freq"] = 6
    m = cfg["mapping"]
    m["final_refine_iters"] = 2
    m["gaussian_capacity"] = 4096
    m["render_list_capacity"] = 512
    m["Training"].update(init_itr_num=4, mapping_itr_num=2, window_size=4,
                         init_gaussian_update=3, init_gaussian_reset=4)

    stream = get_dataset(cfg)
    rng = np.random.RandomState(0)
    depth_fn = lambda im: np.full((H, W), 2.0, np.float32)
    feat_fn = lambda im: rng.rand(H // 14, W // 14, 384).astype(np.float32)
    slam = SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn)

    def gt_injection(store, counter):
        ts = np.clip(np.asarray(store.timestamp).astype(int), 0,
                     T.N_FRAMES - 1)
        h, w = store.disps.shape[-2:]
        return (w2c7[jnp.asarray(ts)],
                jnp.full((store.poses.shape[0], h, w), 0.5))

    slam.frontend.graph.gt_injection = gt_injection
    slam.backend.gt_injection = gt_injection

    # count executed BA steps through the oracle update path
    steps = []
    orig = slam.frontend.graph._update_n_oracle

    def counting(n, *a, **k):
        out = orig(n, *a, **k)
        steps.append(int(out[0]))
        return out

    slam.frontend.graph._update_n_oracle = counting
    slam.run()

    metrics = os.path.join(outdir, f"eps{eps}", "traj",
                           "kf_traj_metrics.txt")
    rmse = None
    for line in open(metrics).read().splitlines():
        if line.strip().startswith("rmse"):
            rmse = float(line.split()[-1])
    return rmse, sum(steps), len(steps)


def main():
    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "tum")
        for eps in (0.0, 0.01, 0.05):
            rmse, n_steps, n_calls = run_once(eps, root,
                                              os.path.join(td, "out"))
            print(f"[eps] update_eps={eps:<5}: kf ATE {rmse*100:8.4f} cm, "
                  f"BA steps executed {n_steps} over {n_calls} update calls",
                  flush=True)


if __name__ == "__main__":
    main()
