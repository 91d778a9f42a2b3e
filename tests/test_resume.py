"""Mid-stream checkpoint / resume equivalence.

Runs the full SLAM pipeline on a synthetic TUM scene three ways:
  A. uninterrupted through all frames;
  B. killed after 8 frames (terminate suppressed, simulating a crash) with
     periodic checkpoints enabled; then
  C. a FRESH system resumed from B's checkpoint, continuing to the end.

A and C must agree on keyframe poses and the Gaussian map — proving the
checkpoint captures the complete system state (KeyframeStore, factor-graph
edges + GRU hidden states, Gaussians + Adam, uncertainty MLP + optimizer,
mapper window/counters/rng, motion-filter features). The reference has no
resume capability at all (SURVEY §5).
"""

import os

import numpy as np
import pytest

from wildgs_slam_tpu.config import load_config

from test_system_e2e import make_tum_scene

H, W = 48, 64


def base_cfg(root, out):
    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["scene"] = "synthetic"
    cfg["dataset"] = "tumrgbd"
    cfg["data"]["input_folder"] = root
    cfg["data"]["output"] = out
    cfg["cam"].update(H=H * 2, W=W * 2, fx=70.0, fy=70.0, cx=W * 1.0,
                      cy=H * 1.0, H_out=H, W_out=W, H_edge=0, W_edge=0)
    cfg["fast_mode"] = True
    t = cfg["tracking"]
    t["buffer"] = 20
    t["warmup"] = 4
    t["force_keyframe_every_n_frames"] = 1
    t["motion_filter"]["thresh"] = 1e9
    t["frontend"].update(window=6, max_factors=32, enable_loop=False)
    t["backend"].update(ba_freq=100, final_ba=False)
    m = cfg["mapping"]
    m["final_refine_iters"] = 4
    m["gaussian_capacity"] = 8192
    m["render_list_capacity"] = 512
    m["Training"].update(init_itr_num=8, mapping_itr_num=4, window_size=4,
                         init_gaussian_update=10, init_gaussian_reset=11)
    return cfg


def build_slam(cfg):
    import jax

    from wildgs_slam_tpu.models import droid_net
    from wildgs_slam_tpu.slam.system import SLAM
    from wildgs_slam_tpu.utils.datasets import get_dataset

    stream = get_dataset(cfg)
    rng = np.random.RandomState(1)
    depth_fn = lambda im: np.full((H, W), 2.0, np.float32)
    feats = rng.rand(16, H // 14, W // 14, 384).astype(np.float32)

    def feat_fn(im):
        # pure function of the image so runs A and C see identical priors
        return feats[int(np.asarray(im).sum() * 1e3) % 16]
    # droid params shared across systems so runs are comparable
    if not hasattr(build_slam, "_droid"):
        build_slam._droid = droid_net.init_droid_params(
            jax.random.PRNGKey(0), H, W)
    return SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn,
                droid_params=build_slam._droid), stream


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    root = str(tmp_path / "tum")
    make_tum_scene(root, n=12, H=H, W=W)

    # A: uninterrupted
    cfg_a = base_cfg(root, str(tmp_path / "out_a"))
    slam_a, _ = build_slam(cfg_a)
    slam_a.run()
    poses_a = np.asarray(slam_a.state.store.poses[: slam_a.state.counter])

    # B: killed after 8 frames with periodic checkpoints
    cfg_b = base_cfg(root, str(tmp_path / "out_b"))
    cfg_b["max_frames"] = 8
    cfg_b["checkpoint_every"] = 2
    slam_b, _ = build_slam(cfg_b)
    slam_b.terminate = lambda: None  # simulate a kill: no final pipeline
    slam_b.run()
    ckpt = os.path.join(str(tmp_path / "out_b"), "synthetic",
                        "checkpoint.npz")
    assert os.path.exists(ckpt), "periodic checkpoint was not written"

    # C: fresh system resumed from B's checkpoint, run to the end
    cfg_c = base_cfg(root, str(tmp_path / "out_b"))  # same output dir
    slam_c, _ = build_slam(cfg_c)
    slam_c.run(resume_path=ckpt)
    poses_c = np.asarray(slam_c.state.store.poses[: slam_c.state.counter])

    assert slam_c.state.counter == slam_a.state.counter
    np.testing.assert_allclose(poses_c, poses_a, atol=1e-5)

    xyz_a = np.asarray(slam_a.mapper.gaussians.params.xyz)
    xyz_c = np.asarray(slam_c.mapper.gaussians.params.xyz)
    alive_a = np.asarray(slam_a.mapper.gaussians.aux.alive)
    alive_c = np.asarray(slam_c.mapper.gaussians.aux.alive)
    np.testing.assert_array_equal(alive_a, alive_c)
    np.testing.assert_allclose(xyz_a[alive_a], xyz_c[alive_c], atol=1e-4)

    # resumed run produced the full artifact set
    out = os.path.join(str(tmp_path / "out_b"), "synthetic")
    for f in ("video.npz", "final_gs.ply", "cfg.yaml"):
        assert os.path.exists(os.path.join(out, f))
    data = np.load(os.path.join(out, "video.npz"))
    assert np.all(np.isfinite(data["poses"]))
