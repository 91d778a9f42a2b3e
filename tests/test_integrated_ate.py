"""Integrated-pipeline ATE gate (VERDICT r2 next-step 6).

test_tracking_convergence.py proves the BA/proposal machinery converges when
driven directly; this test proves the INTEGRATED geometry path: an oracle
update op (GT-reprojection flow targets + high confidence, swapped for the
GRU via FactorGraph.gt_injection) runs through the REAL frame loop —
SLAM.run's motion filter, frontend edge proposal/aging/culling, loop-closure
BA (enable_loop=True), online global BA, keyframe bookkeeping — and the
final keyframe trajectory must reach sub-cm ATE vs GT, per the reference's
eval protocol (src/utils/eval_traj.py:113-140).
"""

import os

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.ops import lie

H, W = 64, 80
N_FRAMES = 12


def gt_trajectory(n):
    """(n, 7) c2w se3 poses: forward translation + gentle yaw + bob."""
    poses = []
    for i in range(n):
        xi = jnp.asarray([0.06 * i, 0.02 * np.sin(0.4 * i), 0.01 * i,
                          0.0, 0.03 * i, 0.005 * i])
        poses.append(lie.se3_exp(xi))
    return jnp.stack(poses)


def write_scene(root, c2w7):
    """View-CONSISTENT scene: every frame observes the same static textured
    plane (world z=2) under its GT camera pose, so a correct map can
    actually reconstruct the views (the PSNR floor below is meaningful)."""
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    Hf, Wf = H * 2, W * 2
    fx = fy = 90.0
    cx, cy = W * 1.0, H * 1.0
    yy, xx = np.meshgrid(np.arange(Hf), np.arange(Wf), indexing="ij")
    dirs = np.stack([(xx - cx) / fx, (yy - cy) / fy, np.ones_like(xx)],
                    -1).astype(np.float64)                    # (Hf, Wf, 3)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(len(c2w7)):
        t = float(i)
        p = np.asarray(c2w7[i], np.float64)
        Rm = np.asarray(lie.se3_matrix(jnp.asarray(p)))[:3, :3]
        o = p[:3]
        d_w = dirs @ Rm.T                                      # world dirs
        s = (2.0 - o[2]) / d_w[..., 2]                         # plane z=2
        pw = o[None, None, :] + s[..., None] * d_w             # world points
        x, y = pw[..., 0], pw[..., 1]
        img = np.stack([
            128 + 100 * np.sin(7.0 * x) * np.cos(5.0 * y),
            128 + 100 * np.cos(6.0 * y + 2.0 * x),
            128 + 80 * np.sin(4.0 * (x + y)),
        ], -1).clip(0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), img)
        depth = (s * 5000).clip(0, 65535).astype(np.uint16)    # z_cam = s
        cv2.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} " + " ".join(f"{v:.9f}" for v in p))
    hdr = "# h\n# h\n# h\n"
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(root, name), "w") as f:
            f.write(hdr + "\n".join(lines))


@pytest.mark.slow
def test_integrated_pipeline_ate(tmp_path):
    c2w7 = gt_trajectory(N_FRAMES)
    w2c7 = jnp.stack([lie.se3_inv(p) for p in c2w7])
    root = str(tmp_path / "tum")
    write_scene(root, c2w7)

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["scene"] = "oracle"
    cfg["dataset"] = "tumrgbd"
    cfg["data"]["input_folder"] = root
    cfg["data"]["output"] = str(tmp_path / "out")
    cfg["cam"].update(H=H * 2, W=W * 2, fx=90.0, fy=90.0, cx=W * 1.0,
                      cy=H * 1.0, H_out=H, W_out=W, H_edge=0, W_edge=0)
    cfg["fast_mode"] = True
    t = cfg["tracking"]
    t["buffer"] = 24
    t["warmup"] = 4
    t["force_keyframe_every_n_frames"] = 1
    t["motion_filter"]["thresh"] = 1e9
    # pure oracle geometry: no metric-depth prior, no uncertainty gating
    t["backend"]["metric_depth_reg"] = False
    t["uncertainty_params"]["activate"] = False
    cfg["mapping"]["uncertainty_params"]["activate"] = False
    t["frontend"].update(window=6, max_factors=32, enable_loop=True)
    t["backend"]["ba_freq"] = 6          # exercise online global BA too
    m = cfg["mapping"]
    m["final_refine_iters"] = 150   # enough refine for a meaningful PSNR floor
    m["gaussian_capacity"] = 4096
    m["render_list_capacity"] = 512
    m["Training"].update(init_itr_num=6, mapping_itr_num=3, window_size=4,
                         init_gaussian_update=5, init_gaussian_reset=6)

    from wildgs_slam_tpu.slam.system import SLAM
    from wildgs_slam_tpu.utils.datasets import get_dataset

    stream = get_dataset(cfg)
    rng = np.random.RandomState(0)
    depth_fn = lambda im: np.full((H, W), 2.0, np.float32)
    feat_fn = lambda im: rng.rand(H // 14, W // 14, 384).astype(np.float32)
    slam = SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn)

    def gt_injection(store, counter):
        ts = np.clip(np.asarray(store.timestamp).astype(int), 0,
                     N_FRAMES - 1)
        poses_gt = w2c7[jnp.asarray(ts)]
        h, w = store.disps.shape[-2:]
        disps_gt = jnp.full((store.poses.shape[0], h, w), 0.5)
        return poses_gt, disps_gt

    slam.frontend.graph.gt_injection = gt_injection
    slam.backend.gt_injection = gt_injection

    slam.run()

    out = os.path.join(str(tmp_path / "out"), "oracle")
    kf_metrics = os.path.join(out, "traj", "kf_traj_metrics.txt")
    assert os.path.exists(kf_metrics)
    txt = open(kf_metrics).read()
    rmse = None
    for line in txt.splitlines():
        if line.strip().startswith("rmse"):
            rmse = float(line.split()[-1])
    assert rmse is not None, txt
    # sub-cm: the integrated plumbing preserved the oracle geometry
    assert rmse < 0.01, f"integrated keyframe ATE {rmse*100:.2f} cm >= 1 cm"

    # render-quality floor on the oracle-geometry scene (VERDICT r4 item 9;
    # the reference's per-kf PSNR diagnostics, mapper.py:1489-1495): with GT
    # poses/depth the map must actually reconstruct a training view
    from wildgs_slam_tpu.slam.mapper import _render_view

    mapper = slam.mapper
    vidx = [v for v in mapper.video_idxs if mapper.is_kf.get(v, False)][-1]
    r = _render_view(mapper.gaussians.params, mapper.gaussians.aux.alive,
                     mapper.vstore.w2c[vidx], mapper.intrinsics_full,
                     mapper.image_size, mapper.render_list_capacity, 64,
                     bin_method=mapper.bin_method, bin_kw=mapper.bin_kw,
                     bin_seg_cap=mapper.bin_seg_cap)
    exp = np.asarray(mapper.vstore.exposure[vidx])
    img = np.clip(np.exp(exp[0]) * np.asarray(r.color) + exp[1], 0, 1)
    gt = np.asarray(mapper.vstore.colors[vidx]).astype(np.float32)
    psnr = -10.0 * np.log10(((img - gt) ** 2).mean() + 1e-12)
    # measured 20.5 dB at this config; 16 leaves headroom for seed noise
    assert psnr >= 16.0, f"training-view PSNR {psnr:.2f} dB below floor"

    # --- non-keyframe pose refinement wiring (eval_traj.py:151-170) ---
    # fast_mode skipped the render-based refinement during terminate();
    # re-run full_traj_eval with it on and assert it (a) actually runs per
    # frame and (b) does not regress the full-trajectory ATE.
    stats_fast = slam.full_traj_eval(os.path.join(out, "traj", "ft_fast"))
    slam.cfg["fast_mode"] = False
    slam.cfg["mapping"]["Training"]["pose_refine_iters"] = 20
    calls = []
    orig = slam.mapper.refine_pose_non_key_frame

    def spy(color, w2c_init, features=None):
        calls.append(1)
        return orig(color, w2c_init, features=features)

    slam.mapper.refine_pose_non_key_frame = spy
    stats_ref = slam.full_traj_eval(os.path.join(out, "traj", "ft_refined"))
    assert len(calls) == N_FRAMES, "refinement did not run per frame"
    # keyframe poses are overwritten post-refine, and the map was built from
    # oracle geometry — refinement must not break the trajectory
    assert stats_ref["rmse"] <= max(1.5 * stats_fast["rmse"], 0.01), (
        stats_ref["rmse"], stats_fast["rmse"])
