"""Mesh-mode system test: the FULL SLAM loop (motion filter -> frontend ->
mapper) running over the 8-device virtual CPU mesh (cfg parallel.n_devices),
with tracking routed through the edge-sharded track step and mapping through
the gaussian-sharded rasterizer + sharded Adam — compared against the
identical single-device run (VERDICT r2 next-step 4).

Equality bar: the sharded paths are numerically equal up to fp32 summation
order (unit-tested exactly in test_multichip.py); over a whole multi-frame
run that noise compounds through the GRU/BA/Adam recursions, so the
system-level assertions use small-but-nonzero tolerances.
"""

import os

import numpy as np
import pytest

import jax

from test_system_e2e import make_tum_scene

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.slam import gaussian_map as gm

ND = 8


def _cfg(tmp_path, root, n_devices, H, W):
    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["scene"] = f"mesh{n_devices}"
    cfg["dataset"] = "tumrgbd"
    cfg["data"]["input_folder"] = root
    cfg["data"]["output"] = str(tmp_path / f"out{n_devices}")
    cfg["cam"].update(H=H * 2, W=W * 2, fx=90.0, fy=90.0, cx=W * 1.0,
                      cy=H * 1.0, H_out=H, W_out=W, H_edge=0, W_edge=0)
    cfg["fast_mode"] = True
    cfg["parallel"]["n_devices"] = n_devices
    t = cfg["tracking"]
    t["buffer"] = 16
    t["warmup"] = 4
    t["force_keyframe_every_n_frames"] = 1
    t["motion_filter"]["thresh"] = 1e9
    t["frontend"].update(window=6, max_factors=32, enable_loop=False)
    # one online dense_ba event fires mid-run in BOTH configs (VERDICT r4
    # item 10: global BA must be exercised under parallel.n_devices=8; the
    # lowmem GRU/BA path itself is replicated, tracking updates are sharded)
    t["backend"]["ba_freq"] = 3
    t["backend"]["final_ba"] = False     # lowmem BA isn't the mesh path
    m = cfg["mapping"]
    m["final_refine_iters"] = 0
    m["gaussian_capacity"] = 4096
    m["render_list_capacity"] = 512
    m["Training"].update(init_itr_num=8, mapping_itr_num=4, window_size=4,
                         init_gaussian_update=6, init_gaussian_reset=7)
    return cfg


def _run(cfg, stream, H, W, resume_path=None, suppress_terminate=False):
    from wildgs_slam_tpu.slam.system import SLAM

    rng = np.random.RandomState(0)
    depth_fn = lambda im: np.full((H, W), 2.0, np.float32)
    feats = [rng.rand(H // 14, W // 14, 384).astype(np.float32)
             for _ in range(len(stream))]

    def feat_fn(im):
        # pure function of the image so separate runs see identical priors
        return feats[int(np.asarray(im).sum() * 1e3) % len(feats)]

    slam = SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn)
    if suppress_terminate:
        slam.terminate = lambda: None
    slam.run(resume_path=resume_path)
    return slam


@pytest.mark.slow
def test_mesh_system_matches_single(tmp_path):
    """Mesh run == single-device run, WITH an online dense_ba event, a
    mid-run checkpoint, and a resume — the mesh leg is run as kill-at-6 +
    resume-to-end, so checkpoint/resume is exercised under
    parallel.n_devices=8 and must land on the single-device result."""
    if jax.device_count() < ND:
        pytest.skip(f"needs {ND} devices")
    H, W = 64, 80
    root = str(tmp_path / "tum")
    make_tum_scene(root, n=9, H=H, W=W)

    from wildgs_slam_tpu.utils.datasets import get_dataset

    from wildgs_slam_tpu.utils.profiling import TIMER

    cfg1 = _cfg(tmp_path, root, 0, H, W)
    n_ba0 = TIMER.stats.get("track.online_global_ba",
                            type("S", (), {"count": 0})).count
    slam1 = _run(cfg1, get_dataset(cfg1), H, W)
    assert TIMER.stats["track.online_global_ba"].count > n_ba0, \
        "online dense_ba never fired (ba_freq too high for the scene?)"

    # mesh leg A: killed after 6 frames with periodic checkpoints
    cfg8a = _cfg(tmp_path, root, ND, H, W)
    cfg8a["max_frames"] = 6
    cfg8a["checkpoint_every"] = 2
    _run(cfg8a, get_dataset(cfg8a), H, W, suppress_terminate=True)
    ckpt = os.path.join(str(tmp_path / f"out{ND}"), f"mesh{ND}",
                        "checkpoint.npz")
    assert os.path.exists(ckpt), "mesh-mode periodic checkpoint not written"

    # mesh leg B: fresh mesh system resumed from the checkpoint, to the end
    cfg8 = _cfg(tmp_path, root, ND, H, W)
    slam8 = _run(cfg8, get_dataset(cfg8), H, W, resume_path=ckpt)
    assert slam8.mesh is not None and slam8.mapper.mesh is not None
    assert slam8.frontend.graph.mesh is not None

    n = slam1.state.counter
    assert slam8.state.counter == n

    p1 = np.asarray(slam1.state.store.poses[:n])
    p8 = np.asarray(slam8.state.store.poses[:n])
    np.testing.assert_allclose(p8, p1, atol=2e-3,
                               err_msg="mesh-mode keyframe poses diverged")

    d1 = np.asarray(slam1.state.store.disps[:n])
    d8 = np.asarray(slam8.state.store.disps[:n])
    np.testing.assert_allclose(d8, d1, atol=5e-3)

    # map: same alive count (same densify decisions) + matching moments
    a1 = int(gm.num_alive(slam1.mapper.gaussians))
    a8 = int(gm.num_alive(slam8.mapper.gaussians))
    assert a1 == a8, (a1, a8)
    x1 = np.asarray(slam1.mapper.gaussians.params.xyz)
    x8 = np.asarray(slam8.mapper.gaussians.params.xyz)
    m1 = np.asarray(slam1.mapper.gaussians.aux.alive)
    np.testing.assert_allclose(x8[m1], x1[m1], atol=5e-3)

    out = os.path.join(str(tmp_path / "out8"), f"mesh{ND}")
    assert os.path.exists(os.path.join(out, "final_gs.ply"))
