"""Quantitative tracker-convergence gates.

The reference's only QA is end-to-end ATE evaluation with pretrained weights
(src/utils/eval_traj.py:113-195). No pretrained droid.pth exists in this
environment, so the GRU flow predictor cannot be exercised for QUALITY (its
numerics are golden-tested against torch in test_droid_net.py). What CAN and
MUST be proven quantitatively is the geometry stack the tracker is built on:
given correct flow targets (the GRU's job), edge proposal + dense BA +
Lie/projective ops must recover the trajectory to sub-centimeter ATE. These
tests are the CI version of the reference's ATE protocol:

  1. DBA-only trajectory recovery: 10-frame GT scene, GT-flow targets,
     identity pose init -> keyframe ATE < 5 mm.
  2. Closed loop with the real proposal machinery: noisy poses/depths,
     FactorGraph.add_proximity_factors proposes the edges, iterated DBA with
     GT-flow targets -> ATE improves >10x and lands < 5 mm.
  3. Loop closure (VERDICT #8): out-and-back revisit trajectory; the backend
     proximity proposal emits genuine loop edges (|i-j| > 20) and loop_ba
     over them stays finite and keeps the trajectory sane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.models import droid_net
from wildgs_slam_tpu.ops import dba, lie, projective
from wildgs_slam_tpu.slam import keyframe_store as kstore
from wildgs_slam_tpu.slam.factor_graph import FactorGraph
from wildgs_slam_tpu.slam.state import SlamState
from wildgs_slam_tpu.utils import eval_traj

HT, WD = 64, 80                      # full-res; 1/8 res = 8 x 10
INTR_FULL = np.array([64.0, 64.0, 40.0, 32.0])


def gt_trajectory(n, step=0.08, yaw=0.02):
    """Forward motion + slow yaw; returns (n, 7) w2c poses."""
    xs = []
    for i in range(n):
        xs.append(jnp.array([step * i, 0.01 * np.sin(0.5 * i), 0.0,
                             0.0, yaw * i, 0.0]))
    return jax.vmap(lie.se3_exp)(jnp.stack(xs))


def gt_disps(n, h=HT // 8, w=WD // 8):
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    base = 1.6 + 0.4 * jnp.sin(0.7 * xx) * jnp.cos(0.9 * yy)  # depth in m
    d = 1.0 / base
    return jnp.tile(d[None], (n, 1, 1)) * (
        1.0 + 0.05 * jnp.sin(jnp.arange(n))[:, None, None])


def ate_rmse(poses_w2c, poses_gt_w2c):
    est = np.asarray(lie.se3_matrix(lie.se3_inv(jnp.asarray(poses_w2c))))
    gt = np.asarray(lie.se3_matrix(lie.se3_inv(jnp.asarray(poses_gt_w2c))))
    return eval_traj.evaluate_ate(est, gt)["rmse"]


def build_store(n, poses_init, disps_init, buffer=32):
    store = kstore.create(buffer, HT, WD, INTR_FULL)
    depth_gt_small = 1.0 / gt_disps(n)
    # full-res GT mono depth (nearest upsample is fine for the prior)
    for i in range(n):
        depth_up = jax.image.resize(depth_gt_small[i], (HT, WD), "nearest")
        store = kstore.append(store, i, float(i), pose=poses_init[i],
                              disp=disps_init[i], mono_depth_up=depth_up)
    return store


def run_gt_flow_dba(store, n, ii, jj, iters_outer, t0, t1,
                    poses_gt, disps_gt):
    """Iterate DBA with targets recomputed as GT reprojections (what a
    perfectly trained GRU would predict)."""
    target, _ = projective.projective_transform(
        poses_gt, disps_gt, store.intrinsics, ii, jj)
    weight = jnp.ones(target.shape)
    valid = jnp.ones(ii.shape[0], bool)
    eta = jnp.full(store.disps.shape, 0.005)
    groups = jnp.asarray(dba.make_edge_groups(
        np.asarray(ii), store.poses.shape[0], 16))
    for _ in range(iters_outer):
        store = kstore.ba(store, target, weight, eta, ii, jj, valid, groups,
                          t0, t1, iters=2, metric_depth_reg=True,
                          uncertainty_aware=False, pmax=n)
    return store


def test_dba_recovers_trajectory_from_identity():
    n = 10
    poses_gt = gt_trajectory(n)
    disps_gt = gt_disps(n)

    # SLAM-like init: every pose at identity, constant disparity
    init_poses = jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1.0]), (n, 1))
    store = build_store(n, init_poses, jnp.ones((n, HT // 8, WD // 8)) * 0.5)

    # neighborhood edges r=3, both directions (frontend init pattern)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= 3)
    ii, jj = jnp.asarray(ii[keep]), jnp.asarray(jj[keep])

    ate0 = ate_rmse(store.poses[:n], poses_gt)
    # pad GT structures into buffer-sized arrays for target computation
    poses_gt_pad = store.poses.at[:n].set(poses_gt)
    disps_gt_pad = store.disps.at[:n].set(disps_gt)
    store = run_gt_flow_dba(store, n, ii, jj, iters_outer=12, t0=1, t1=n,
                            poses_gt=poses_gt_pad, disps_gt=disps_gt_pad)
    ate1 = ate_rmse(store.poses[:n], poses_gt)

    assert np.isfinite(ate1)
    assert ate1 < 0.005, f"keyframe ATE {ate0*100:.2f} -> {ate1*100:.3f} cm"
    # depth recovered too (scale anchored by the metric prior)
    derr = float(jnp.abs(1 / store.disps[:n] - 1 / disps_gt).mean())
    assert derr < 0.05, f"mean depth error {derr:.3f} m"


def test_closed_loop_proposal_plus_dba():
    n = 12
    poses_gt = gt_trajectory(n)
    disps_gt = gt_disps(n)

    rng = np.random.RandomState(0)
    noise = jnp.asarray(0.03 * rng.randn(n, 6))
    poses0 = lie.se3_mul(jax.vmap(lie.se3_exp)(noise), poses_gt)
    disps0 = disps_gt * jnp.asarray(1.0 + 0.2 * rng.randn(n, 1, 1))

    store = build_store(n, poses0, disps0)
    state = SlamState.create({}, HT, WD, INTR_FULL, buffer=32,
                             uncertainty_aware=False, metric_depth_reg=True)
    state.store = store
    state.counter = n

    # REAL edge proposal (host NMS heuristics, factor_graph.py:325-385)
    graph = FactorGraph(state, params=None, corr_impl="none", max_factors=64)
    graph.corr_impl = "none"
    graph.add_proximity_factors(0, 0, rad=2, nms=2, thresh=16.0, remove=False)
    assert len(graph.ii) >= 3 * n, f"proposal produced {len(graph.ii)} edges"
    ii, jj = jnp.asarray(graph.ii), jnp.asarray(graph.jj)

    ate0 = ate_rmse(store.poses[:n], poses_gt)
    poses_gt_pad = store.poses.at[:n].set(poses_gt)
    disps_gt_pad = store.disps.at[:n].set(disps_gt)
    store = run_gt_flow_dba(state.store, n, ii, jj, iters_outer=12,
                            t0=1, t1=n,
                            poses_gt=poses_gt_pad, disps_gt=disps_gt_pad)
    ate1 = ate_rmse(store.poses[:n], poses_gt)

    assert ate1 < ate0 / 10, f"ATE {ate0*100:.2f} -> {ate1*100:.3f} cm"
    assert ate1 < 0.005, f"final keyframe ATE {ate1*100:.3f} cm"


@pytest.mark.slow
def test_loop_closure_edges_and_ba():
    """Out-and-back trajectory: frames k and (n-1-k) revisit the same pose.
    The backend loop proposal must emit |i-j|>20 edges; loop_ba over them
    (random GRU weights — finiteness/topology gate) must stay finite."""
    n = 28
    fwd = gt_trajectory(15, step=0.12, yaw=0.0)
    back = fwd[::-1][1:][: n - 15]
    poses_gt = jnp.concatenate([fwd, back])[:n]
    disps_gt = gt_disps(n)

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["tracking"]["buffer"] = 32
    state = SlamState.create(cfg, HT, WD, INTR_FULL, buffer=32,
                             uncertainty_aware=False, metric_depth_reg=True)
    state.counter = n

    rng = np.random.RandomState(1)
    params = droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)
    store = build_store(n, poses_gt, disps_gt)
    # random features for the GRU path
    store = store._replace(
        fmaps=jnp.asarray(rng.randn(32, HT // 8, WD // 8, 128) * 0.1,
                          jnp.float32),
        nets=jnp.asarray(rng.randn(32, HT // 8, WD // 8, 128) * 0.1,
                         jnp.float32),
        inps=jnp.asarray(rng.randn(32, HT // 8, WD // 8, 128) * 0.1,
                         jnp.float32))
    state.store = store

    # 1) loop edges proposed by the real backend proposal
    graph = FactorGraph(state, params, corr_impl="alt", max_factors=200,
                        pmax=32)
    n_edges = graph.add_backend_proximity_factors(
        t_start=0, t_end=n, nms=2, radius=1, thresh=25.0, max_factors=200,
        beta=0.75, t_start_loop=max(0, n - 25), loop=True)
    assert n_edges > 0, "no loop edges proposed on a revisit trajectory"
    span = np.abs(graph.ii - graph.jj)
    assert (span > 20).any(), f"no long-range loop edges (max span {span.max()})"

    # 2) full loop_ba through the Backend (GRU with random weights)
    from wildgs_slam_tpu.slam.backend import Backend

    state.store = store  # reset
    backend = Backend(state, params, cfg)
    window, n_edges = backend.loop_ba(t_start=0, t_end=n, steps=2,
                                      motion_only=False)
    assert n_edges > 0
    poses_after = np.asarray(state.store.poses[:n])
    assert np.all(np.isfinite(poses_after))
    # quaternions stay normalized (retraction sanity)
    qn = np.linalg.norm(poses_after[:, 3:], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-4)
