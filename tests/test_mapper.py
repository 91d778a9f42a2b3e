"""Mapper integration test: initialize + per-keyframe mapping on a synthetic
scene with known geometry (flat textured wall), uncertainty MLP training in
the loop, Gaussian deformation after a simulated BA pose update."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.ops import lie
from wildgs_slam_tpu.slam import gaussian_map as gm
from wildgs_slam_tpu.slam import keyframe_store as kstore
from wildgs_slam_tpu.slam.mapper import Mapper, _deform_rigid
from wildgs_slam_tpu.slam.state import SlamState

HT, WD = 56, 56  # divisible by 8 and close to 14-multiples


@pytest.fixture(scope="module")
def cfg():
    c = load_config("configs/wildgs_slam.yaml")
    c["mapping"]["Training"]["init_itr_num"] = 30
    c["mapping"]["Training"]["init_gaussian_update"] = 20
    c["mapping"]["Training"]["init_gaussian_reset"] = 25
    c["mapping"]["Training"]["mapping_itr_num"] = 20
    c["mapping"]["Training"]["window_size"] = 4
    c["mapping"]["gaussian_capacity"] = 8192
    c["mapping"]["render_list_capacity"] = 512
    c["tracking"]["buffer"] = 8
    return c


def textured_wall(t):
    """Camera at exp(t*xi) looking at a textured plane at z=2."""
    y, x = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    img = np.stack([
        0.5 + 0.4 * np.sin(0.3 * x + t),
        0.5 + 0.4 * np.cos(0.25 * y),
        0.5 + 0.3 * np.sin(0.2 * (x + y)),
    ], -1).astype(np.float32)
    return np.clip(img, 0, 1)


def make_state(cfg, n_kf=3):
    intr = np.array([50.0, 50.0, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr,
                             buffer=cfg["tracking"]["buffer"])
    rng = np.random.RandomState(0)
    for i in range(n_kf):
        xi = np.zeros(6)
        xi[0] = 0.05 * i
        pose = lie.se3_exp(jnp.asarray(xi))
        depth = np.full((HT, WD), 2.0, np.float32)
        state.store = kstore.append(
            state.store, i, float(i), pose=pose,
            disp=jnp.full((HT // 8, WD // 8), 0.5),
            mono_depth_up=jnp.asarray(depth))
        dino = rng.rand(HT // 14, WD // 14, 384).astype(np.float32)
        state.append_host(i, textured_wall(i), dino, float(i))
    return state


@pytest.mark.slow
def test_mapper_initialize_and_keyframe(cfg):
    state = make_state(cfg, n_kf=3)
    mapper = Mapper(state, cfg, rng_seed=0)

    mapper.initialize_mapper(cur_video_idx=1)
    n_after_init = int(gm.num_alive(mapper.gaussians))
    assert n_after_init > 50
    assert mapper.iteration_count == cfg["mapping"]["Training"]["init_itr_num"]
    assert len(mapper.current_window) == 2
    # uncertainty MLP trained (params moved)
    assert float(jnp.abs(
        mapper.uncer_params["params"]["fc1"]["kernel"]).sum()) > 0
    assert int(mapper.uncer_count) > 0

    # incoming keyframe 2
    mapper.on_keyframe(2, 2)
    assert 2 in mapper.current_window
    assert mapper.is_kf[2]
    assert int(gm.num_alive(mapper.gaussians)) > n_after_init / 2
    assert np.all(np.isfinite(np.asarray(mapper.gaussians.params.xyz)))

    # exposure was optimized for non-first frames
    exp = np.asarray(mapper.vstore.exposure[:3])
    assert np.allclose(exp[0], 0.0)

    # loss decreased over init (render error sane)
    out = mapper._render_ntouched(0)
    assert int((out > 0).sum()) > 0


def test_non_metric_depth_branch(cfg):
    """Non-metric-depth mapping branch (mapper.py:586-646): the frontend BA
    depth is Splat-SLAM-filled with aligned mono depth, and keyframes with
    < 100 multiview-valid pixels are invalid and skipped."""
    import copy

    c = copy.deepcopy(cfg)
    c["tracking"]["backend"]["metric_depth_reg"] = False
    c["mapping"]["Training"].update(init_itr_num=4, mapping_itr_num=2,
                                    init_gaussian_update=3,
                                    init_gaussian_reset=4)

    intr = np.array([50.0, 50.0, WD / 2, HT / 2])
    state = SlamState.create(c, HT, WD, intr, buffer=c["tracking"]["buffer"],
                             metric_depth_reg=False)
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    true_depth = (2.0 + 0.01 * xx + 0.005 * yy).astype(np.float32)
    # mono prior = affine distortion of truth (scale 2.0, shift -1.0 in
    # depth), so the fill has a real alignment to recover
    mono_depth = (true_depth + 1.0) / 2.0

    for i in range(3):
        xi = np.zeros(6)
        xi[0] = 0.05 * i
        pose = lie.se3_exp(jnp.asarray(xi))
        state.store = kstore.append(
            state.store, i, float(i), pose=pose,
            disp=jnp.asarray(1.0 / true_depth[::8, ::8]),
            mono_depth_up=jnp.asarray(mono_depth))
        dino = rng.rand(HT // 14, WD // 14, 384).astype(np.float32)
        state.append_host(i, textured_wall(i), dino, float(i))

    # frontend full-res depth + multiview validity: kf0 has a hole to be
    # mono-filled, kf2 has < 100 valid pixels -> invalid
    B = state.store.poses.shape[0]
    disps_up = np.tile(1.0 / true_depth, (B, 1, 1))
    mask = np.zeros((B, HT, WD), bool)
    mask[0] = True
    mask[0, 20:32, 20:40] = False
    mask[1] = True
    mask[2].reshape(-1)[:60] = True
    state.store = state.store._replace(
        disps_up=jnp.asarray(disps_up), valid_depth_mask=jnp.asarray(mask))

    mapper = Mapper(state, c, rng_seed=0)
    mapper.initialize_mapper(cur_video_idx=1)
    assert mapper.is_kf[0] and mapper.is_kf[1]

    # hole pixels were filled with scale/shift-aligned mono depth ~ truth
    d0 = np.asarray(mapper.vstore.depths[0])
    np.testing.assert_allclose(d0[~mask[0]],
                               true_depth[~mask[0]], rtol=0.02)
    np.testing.assert_allclose(d0[26, 30], true_depth[26, 30], rtol=0.02)
    # alignment recovered scale=2, shift=-1 and was persisted into the store
    assert abs(float(state.store.depth_scale[0]) - 2.0) < 0.05
    assert abs(float(state.store.depth_shift[0]) + 1.0) < 0.1

    # invalid keyframe is skipped entirely
    n_before = int(gm.num_alive(mapper.gaussians))
    mapper.on_keyframe(2, 2)
    assert mapper.is_kf[2] is False
    assert 2 not in mapper.current_window
    assert 2 not in mapper.video_idxs
    assert int(gm.num_alive(mapper.gaussians)) == n_before

    # refine wrapper (jitted _refine_prep) with uncertainty features
    c["mapping"]["Training"]["pose_refine_iters"] = 5
    feats = np.random.RandomState(3).rand(HT // 14, WD // 14,
                                          384).astype(np.float32)
    w2c = mapper.refine_pose_non_key_frame(
        textured_wall(0), np.asarray(state.store.poses[0]), features=feats)
    assert np.all(np.isfinite(np.asarray(w2c)))


def test_refine_pose_non_key_frame():
    """Pose refinement against a known map recovers a perturbed pose
    (mapper.py:810-917 semantics)."""
    from wildgs_slam_tpu.ops.rasterizer import render
    from wildgs_slam_tpu.slam.mapper import _refine_pose_core

    key = jax.random.PRNGKey(0)
    N, H, W = 150, 48, 64
    k1, k2, k3 = jax.random.split(key, 3)
    means = jnp.concatenate([jax.random.uniform(k1, (N, 2)) * 2.4 - 1.2,
                             2.0 + jax.random.uniform(k2, (N, 1)) * 1.5], -1)
    scales = 0.08 + 0.1 * jax.random.uniform(k3, (N, 3))
    rots = jnp.tile(jnp.array([0., 0, 0, 1.]), (N, 1))
    opac = jnp.full((N,), 0.95)
    shc = jax.random.uniform(jax.random.PRNGKey(8), (N, 1, 3))
    intr = jnp.array([55.0, 55.0, W / 2, H / 2])
    gt = render(means, scales, rots, opac, shc, lie.se3_identity(), intr,
                (H, W), capacity=256, chunk=32)

    gmap = gm.create(256, max_sh_degree=0)
    params = gm.GaussianParams(
        xyz=means, f_dc=shc[:, :1], f_rest=jnp.zeros((N, 0, 3)),
        opacity=jnp.log(opac / (1 - opac))[:, None], scaling=jnp.log(scales),
        rotation=jnp.concatenate([rots[:, 3:4], rots[:, :3]], -1))
    gmap, _ = gm.extend(gmap, params, jnp.ones(N, bool), kf_id=0)

    w2c_bad = lie.se3_exp(jnp.array([0.02, -0.01, 0.0, 0.005, -0.008, 0.004]))
    err0 = float(jnp.linalg.norm(lie.se3_log(w2c_bad)))
    w2c_ref = _refine_pose_core(
        gmap.params, gmap.aux.alive, w2c_bad, gt.color, jnp.ones((H, W)),
        None, intr, (H, W), 256, 32, 0.003, 0.001, 0.01)
    err1 = float(jnp.linalg.norm(lie.se3_log(w2c_ref)))
    assert err1 < 0.5 * err0


def test_deform_rigid_moves_only_anchored():
    gmap = gm.create(64, max_sh_degree=0)
    key = jax.random.PRNGKey(0)
    new = gm.GaussianParams(
        xyz=jax.random.normal(key, (10, 3)),
        f_dc=jnp.zeros((10, 1, 3)), f_rest=jnp.zeros((10, 0, 3)),
        opacity=jnp.zeros((10, 1)), scaling=jnp.full((10, 3), -2.0),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (10, 1)))
    gmap, _ = gm.extend(gmap, new, jnp.ones(10, bool), kf_id=0)
    new2 = new._replace(xyz=new.xyz + 5.0)
    gmap, _ = gm.extend(gmap, new2, jnp.ones(10, bool), kf_id=1)

    w2c_old = lie.se3_identity()
    w2c_new = lie.se3_exp(jnp.array([0.3, 0, 0, 0, 0.2, 0]))
    before = np.asarray(gmap.params.xyz).copy()
    kf_ids = np.asarray(gmap.aux.kf_id)
    gmap2 = _deform_rigid(gmap, 0, w2c_new, w2c_old)
    after = np.asarray(gmap2.params.xyz)
    alive = np.asarray(gmap.aux.alive)

    moved = np.abs(after - before).sum(-1)
    assert np.all(moved[alive & (kf_ids == 0)] > 1e-4)
    assert np.all(moved[alive & (kf_ids == 1)] == 0)

    # deformation = c2w_old ∘ w2c_new applied in world frame: verify one point
    T = lie.se3_inv(lie.se3_mul(lie.se3_inv(w2c_old), w2c_new))
    i = np.where(alive & (kf_ids == 0))[0][0]
    expect = lie.se3_act(T, jnp.asarray(before[i]))
    np.testing.assert_allclose(after[i], np.asarray(expect), atol=1e-5)
    # xyz/rotation adam state zeroed
    assert float(jnp.abs(gmap2.adam.mu.xyz).sum()) == 0.0
