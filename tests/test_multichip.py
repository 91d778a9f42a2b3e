"""Stage-4 multi-chip sharding equality tests (8-device virtual CPU mesh).

The sharded paths must be NUMERICALLY EQUAL (up to fp32 summation order) to
their single-device counterparts:

  * edge-sharded DBA (parallel/sharded_dba.py) vs ops/dba.ba — psum'd
    (P,P,6,6) Schur pose blocks, owned-frame depth back-substitution;
  * gaussian/tile-sharded rasterizer (parallel/sharded_raster.py) vs the
    single-device fused Pallas path — projection/binning sharded by
    Gaussians, all_to_all, compositing sharded by tiles — forward AND
    gradients (including camera-pose gradients through pose_delta).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgs_slam_tpu.models import droid_net
from wildgs_slam_tpu.ops import correlation, dba, lie, projective
from wildgs_slam_tpu.ops.rasterizer import render_pallas
from wildgs_slam_tpu.parallel import sharded_dba, sharded_raster, \
    sharded_track
from wildgs_slam_tpu.parallel.mesh import make_mesh
from wildgs_slam_tpu.slam import factor_graph

ND = 8


def need_devices():
    if jax.device_count() < ND:
        pytest.skip(f"needs {ND} devices")


# ---------------------------------------------------------------------------
# sharded DBA
# ---------------------------------------------------------------------------

F, H, W = 8, 6, 8
INTR = jnp.array([8.0, 8.0, W / 2 - 0.5, H / 2 - 0.5])


def dba_problem(key=0, perturb=0.03):
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    poses_gt = lie.se3_exp(0.04 * jax.random.normal(k1, (F, 6)))
    disps_gt = 0.5 + 0.2 * jax.random.uniform(k2, (F, H, W))
    ii, jj = np.meshgrid(np.arange(F), np.arange(F), indexing="ij")
    keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= 2)
    ii, jj = jnp.asarray(ii[keep]), jnp.asarray(jj[keep])
    target, _ = projective.projective_transform(poses_gt, disps_gt, INTR,
                                                ii, jj)
    weight = 0.5 + 0.5 * jax.random.uniform(
        jax.random.PRNGKey(5), target.shape)
    poses0 = lie.se3_mul(lie.se3_exp(perturb * jax.random.normal(k3, (F, 6))),
                         poses_gt)
    disps0 = disps_gt + perturb * jax.random.normal(
        jax.random.PRNGKey(9), (F, H, W))
    eta = jnp.full((F, H, W), 0.05)
    sensor = disps_gt * 1.1
    sensor_valid = jnp.ones((F, H, W), bool)
    return dict(poses0=poses0, disps0=disps0, target=target, weight=weight,
                eta=eta, ii=ii, jj=jj, sensor=sensor,
                sensor_valid=sensor_valid)


@pytest.mark.parametrize("use_sensor", [False, True])
def test_sharded_dba_matches_single_device(use_sensor):
    need_devices()
    prob = dba_problem()
    t0, t1 = 1, F
    pmax = F - 1
    E = prob["ii"].shape[0]
    valid = jnp.ones(E, bool)

    # single-device oracle (2 GN iterations)
    groups_g = jnp.asarray(dba.make_edge_groups(np.asarray(prob["ii"]),
                                                F, 16))
    poses_ref, disps_ref = dba.ba(
        prob["poses0"], prob["disps0"], INTR, prob["target"], prob["weight"],
        prob["eta"], prob["ii"], prob["jj"], valid, groups_g, t0, t1,
        iters=2,
        sensor_disps=prob["sensor"] if use_sensor else None,
        sensor_valid=prob["sensor_valid"] if use_sensor else None,
        pmax=pmax)

    # sharded
    mesh = make_mesh(ND, axis="edge")
    meta = sharded_dba.shard_edges_by_frame(prob["ii"], prob["jj"], ND, F,
                                            degree=16)
    tgt, wgt, iiv, jjv, vv = sharded_dba.gather_edges(
        [prob["target"], prob["weight"], prob["ii"], prob["jj"], valid],
        meta["perm"])
    vv = vv & jnp.asarray(meta["valid"].reshape(-1))

    fn = sharded_dba.make_sharded_ba(mesh, F, (H, W), meta["e_cap"], pmax,
                                     degree=16, use_sensor=use_sensor,
                                     iters=2)
    poses_sh, disps_sh = fn(
        prob["poses0"], prob["disps0"], INTR, tgt, wgt, prob["eta"],
        iiv, jjv, vv, jnp.asarray(meta["groups"]),
        jnp.asarray(meta["owner"]), jnp.int32(t0), jnp.int32(t1),
        prob["sensor"], prob["sensor_valid"])

    np.testing.assert_allclose(np.asarray(poses_sh), np.asarray(poses_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(disps_sh), np.asarray(disps_ref),
                               atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# sharded full track step (GRU + corr + DBA + upsample)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sharded_track_step_matches_update_core():
    need_devices()
    FB, n = 16, 8          # buffer frames, active window
    h, w = H, W
    pmax = 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    poses = lie.se3_exp(0.03 * jax.random.normal(ks[0], (FB, 6)))
    disps = 0.4 + 0.3 * jax.random.uniform(ks[1], (FB, h, w))
    disps_up = jnp.zeros((FB, h * 8, w * 8))
    uncert = jax.random.uniform(ks[2], (FB, h, w))
    mono = 0.5 + 0.1 * jax.random.uniform(ks[3], (FB, h, w))
    mono_mask = jnp.ones((FB, h, w), bool)
    fmaps = 0.1 * jax.random.normal(ks[4], (FB, h, w, 128))

    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= 2)
    ii, jj = ii[keep], jj[keep]
    E = len(ii)
    iid, jjd = jnp.asarray(ii), jnp.asarray(jj)

    params = droid_net.init_droid_params(jax.random.PRNGKey(1), h * 8, w * 8)
    net = 0.1 * jax.random.normal(ks[5], (E, h, w, 128))
    inp = 0.1 * jax.random.normal(ks[6], (E, h, w, 128))
    target, _ = projective.projective_transform(poses, disps, INTR, iid, jjd)
    target = target + 0.1 * jax.random.normal(ks[7], target.shape)
    weight = jnp.zeros((E, h, w, 2))
    pyr = correlation.corr_pyramid(fmaps[iid], fmaps[jjd])
    damping = 1e-6 * jnp.ones((FB, h, w))
    valid = jnp.ones(E, bool)
    t0, t1 = 1, n
    frame_base = 0

    # single-device oracle: _update_core with no inactive edges, no padding
    groups_g = jnp.asarray(dba.make_edge_groups(ii, FB, 16))
    ref = factor_graph._update_core(
        params, poses, disps, disps_up, INTR, uncert, mono, mono_mask,
        net, inp, target, weight, *pyr, iid, jjd, valid, frame_base,
        jnp.zeros((1, h, w, 2)), jnp.zeros((1, h, w, 2)),
        jnp.zeros(1, jnp.int64), jnp.zeros(1, jnp.int64),
        jnp.zeros(1, bool), damping, groups_g, t0, t1, jnp.float32(0.0),
        n=1, iters=2, pmax=pmax, motion_only=False, metric_depth_reg=True,
        uncertainty_aware=True)

    # sharded
    mesh = make_mesh(ND, axis="edge")
    meta = sharded_dba.shard_edges_by_frame(ii, jj, ND, FB, degree=16)
    netv, inpv, tgtv, wgtv, c0, c1, c2, c3, iiv, jjv, vv = \
        sharded_dba.gather_edges(
            [net, inp, target, weight, *pyr, iid, jjd, valid], meta["perm"])
    vv = vv & jnp.asarray(meta["valid"].reshape(-1))

    fn = sharded_track.make_sharded_track_step(
        mesh, FB, (h, w), meta["e_cap"], pmax, degree=16, iters=2,
        metric_depth_reg=True, uncertainty_aware=True)
    (net2, tgt2, wgt2, damp2, poses2, disps2, disps_up2) = fn(
        params, poses, disps, disps_up, INTR, uncert, mono, mono_mask,
        netv, inpv, tgtv, wgtv, c0, c1, c2, c3, iiv, jjv, vv, vv,
        jnp.int32(frame_base), damping, jnp.asarray(meta["groups"]),
        jnp.asarray(meta["owner"]), jnp.int32(t0), jnp.int32(t1))

    np.testing.assert_allclose(np.asarray(poses2), np.asarray(ref.poses),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(disps2), np.asarray(ref.disps),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(damp2), np.asarray(ref.damping),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(disps_up2),
                               np.asarray(ref.disps_up), atol=1e-5,
                               rtol=1e-4)

    # per-edge outputs: compare through the device-major permutation
    perm = meta["perm"].reshape(-1)
    pvalid = meta["valid"].reshape(-1)
    for name, sh_arr, ref_arr in (("net", net2, ref.net),
                                  ("target", tgt2, ref.target),
                                  ("weight", wgt2, ref.weight)):
        np.testing.assert_allclose(
            np.asarray(sh_arr)[pvalid], np.asarray(ref_arr)[perm[pvalid]],
            atol=1e-5, rtol=1e-4, err_msg=name)


# ---------------------------------------------------------------------------
# sharded rasterizer
# ---------------------------------------------------------------------------

RH, RW = 32, 64     # 2 x 4 = 8 tiles over 8 devices
RINTR = jnp.array([50.0, 50.0, RW / 2, RH / 2])
NG = 512
CAP_LOC = 32        # merged capacity = 8 * 32 = 256


def raster_scene(key=0):
    k = jax.random.PRNGKey(key)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    means = jnp.concatenate([
        jax.random.uniform(k1, (NG, 2)) * 2 - 1,
        1.5 + jax.random.uniform(k2, (NG, 1)) * 2,
    ], -1)
    scales = 0.02 + 0.05 * jax.random.uniform(k3, (NG, 3))
    rots = jax.random.normal(k4, (NG, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = 0.3 + 0.6 * jax.random.uniform(k5, (NG,))
    sh = jax.random.uniform(jax.random.PRNGKey(9), (NG, 1, 3))
    alive = jax.random.uniform(jax.random.PRNGKey(11), (NG,)) > 0.1
    return means, scales, rots, opac, sh, alive


def test_sharded_render_matches_single_device():
    need_devices()
    means, scales, rots, opac, sh, alive = raster_scene()
    w2c = lie.se3_exp(jnp.array([0.02, -0.01, 0.0, 0.01, 0.02, 0.0]))
    bg = jnp.array([0.1, 0.2, 0.3])

    ref = render_pallas(means, scales, rots, opac, sh, w2c, RINTR, (RH, RW),
                        capacity=ND * CAP_LOC, chunk=32, bg=bg, alive=alive)
    assert int(ref.overflow) == 0, "scene too dense for equality test"

    mesh = make_mesh(ND, axis="g")
    fn = sharded_raster.make_sharded_render(
        mesh, (RH, RW), capacity_local=CAP_LOC, chunk=32)
    out = fn(means, scales, rots, opac, sh, w2c, RINTR, alive=alive, bg=bg)

    assert int(out.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-5, rtol=1e-4)


def test_sharded_render_gradients_match():
    need_devices()
    means, scales, rots, opac, sh, alive = raster_scene(1)
    w2c = lie.se3_exp(jnp.array([0.0, 0.01, 0.0, -0.01, 0.0, 0.01]))
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(3)
    wc = jax.random.uniform(key, (RH, RW, 3))

    def loss_single(means, scales, opac, sh, pose_delta):
        out = render_pallas(means, scales, rots, opac, sh, w2c, RINTR,
                            (RH, RW), capacity=ND * CAP_LOC, chunk=32,
                            bg=bg, alive=alive, pose_delta=pose_delta)
        return (jnp.sum(out.color * wc) + 0.5 * jnp.sum(out.depth)
                + 0.25 * jnp.sum(out.alpha))

    mesh = make_mesh(ND, axis="g")
    fn = sharded_raster.make_sharded_render(
        mesh, (RH, RW), capacity_local=CAP_LOC, chunk=32)

    def loss_sharded(means, scales, opac, sh, pose_delta):
        out = fn(means, scales, rots, opac, sh, w2c, RINTR,
                 pose_delta=pose_delta, alive=alive, bg=bg)
        return (jnp.sum(out.color * wc) + 0.5 * jnp.sum(out.depth)
                + 0.25 * jnp.sum(out.alpha))

    pd = jnp.zeros(6)
    g_ref = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(
        means, scales, opac, sh, pd)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(
        means, scales, opac, sh, pd)

    names = ["means", "scales", "opacity", "sh", "pose_delta"]
    for name, a, b in zip(names, g_ref, g_sh):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"gradient mismatch: {name}")


# ---------------------------------------------------------------------------
# gaussian-sharded mapping optimization (VERDICT r2 next-step 8)
# ---------------------------------------------------------------------------

def _scene_gmap(capacity=None):
    """raster_scene packed into a fixed-capacity GaussianMap."""
    from wildgs_slam_tpu.slam import gaussian_map as gm

    means, scales, rots, opac, sh, alive = raster_scene(2)
    C = capacity or NG
    m = gm.create(C, max_sh_degree=0)
    rot_wxyz = jnp.concatenate([rots[:, 3:4], rots[:, :3]], axis=-1)
    params = m.params._replace(
        xyz=m.params.xyz.at[:NG].set(means),
        f_dc=m.params.f_dc.at[:NG].set(sh),
        opacity=m.params.opacity.at[:NG].set(
            gm.inverse_sigmoid(jnp.clip(opac, 1e-4, 1 - 1e-4))[:, None]),
        scaling=m.params.scaling.at[:NG].set(jnp.log(scales)),
        rotation=m.params.rotation.at[:NG].set(rot_wxyz))
    aux = m.aux._replace(
        alive=m.aux.alive.at[:NG].set(alive),
        kf_id=m.aux.kf_id.at[:NG].set(0))
    return m._replace(params=params, aux=aux)


def test_gsharded_render_pad_and_mask():
    """Image sizes whose tile count doesn't divide D render through the
    pad-and-crop wrapper and match the single-device rasterizer."""
    need_devices()
    from wildgs_slam_tpu.parallel import mesh as pmesh

    H2, W2 = 40, 48  # 3 x 3 = 9 tiles: NOT divisible by 8
    intr = jnp.array([40.0, 40.0, W2 / 2, H2 / 2])
    gmap = _scene_gmap()
    w2c = lie.se3_exp(jnp.array([0.01, 0.0, 0.0, 0.0, 0.01, 0.0]))

    from wildgs_slam_tpu.slam import gaussian_map as gm
    p = gmap.params
    ref = render_pallas(p.xyz, gm.get_scaling(p), gm.get_rotation_xyzw(p),
                        gm.get_opacity(p), gm.get_sh(p), w2c, intr, (H2, W2),
                        capacity=ND * CAP_LOC, chunk=32, alive=gmap.aux.alive)
    assert int(ref.overflow) == 0

    mesh = make_mesh(ND, axis="g")
    assert pmesh.pad_image_size_for_mesh((H2, W2), ND)[0] % 16 == 0
    # 2x the local capacity: this denser 40x48 framing funnels >CAP_LOC of
    # one shard's gaussians into the hot center tile
    rfn = pmesh.make_gsharded_render_fn(mesh, (H2, W2),
                                        capacity_local=2 * CAP_LOC, chunk=32)
    out = rfn(gmap.params, gmap.aux.alive, w2c, intr)
    assert int(out.overflow) == 0
    assert out.color.shape == (H2, W2, 3)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-4, rtol=1e-4)


def test_gsharded_opt_segment_matches_single():
    """mapper._opt_segment with the map SHARDED BY GAUSSIAN SLOT over the
    8-device mesh (params + Adam moments + aux sharded, rendering through
    the gaussians->tiles all_to_all rasterizer) matches the single-device
    segment: same losses, same final map, same exposure/uncertainty-MLP
    updates."""
    need_devices()
    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.models.uncertainty import UncertaintyMLP
    from wildgs_slam_tpu.parallel import mesh as pmesh
    from wildgs_slam_tpu.slam import gaussian_map as gm
    from wildgs_slam_tpu.slam import mapper as M
    from wildgs_slam_tpu.slam import viewpoints

    cfg = load_config("configs/wildgs_slam.yaml")
    loss_cfg = dict(
        alpha=cfg["mapping"]["Training"]["alpha"],
        rgb_boundary_threshold=cfg["mapping"]["Training"][
            "rgb_boundary_threshold"],
        ssim_loss=cfg["mapping"]["Training"]["ssim_loss"],
        lambda_dssim=cfg["mapping"]["opt_params"]["lambda_dssim"],
        uncertainty_params=cfg["mapping"]["uncertainty_params"],
        opt_params=cfg["mapping"]["opt_params"])

    fh = fw = 4
    fd = 16
    B = 6
    rng = np.random.RandomState(0)
    vs = viewpoints.create(B, RH, RW, (fh, fw), fd)
    for i in range(B):
        vs = viewpoints.set_view(
            vs, i, jnp.asarray(rng.rand(RH, RW, 3).astype(np.float32)),
            jnp.asarray(2.0 + 0.1 * rng.rand(RH, RW).astype(np.float32)),
            lie.se3_exp(jnp.asarray(0.02 * rng.randn(6))),
            features=jnp.asarray(rng.rand(fh, fw, fd).astype(np.float32)))

    mlp = UncertaintyMLP(in_dim=fd)
    u_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, fd)))
    u_mu = jax.tree.map(jnp.zeros_like, u_params)
    u_nu = jax.tree.map(jnp.zeros_like, u_params)

    K, S = 4, 8
    idxs = jnp.asarray([1, 2, 3, 1])
    freeze = jnp.asarray([False, False, True, False])
    d_base = jnp.asarray(np.clip(np.asarray(idxs) - 2, 0, B - 5))
    d_samples = jnp.asarray(rng.randint(0, 5 * fh * fw, size=(K, S)))
    step_valid = jnp.ones(K, bool)
    iter_offsets = jnp.arange(K)

    gmap = _scene_gmap()

    def run(gmap_in, render_fn):
        return M._opt_segment(
            gmap_in, vs, u_params, u_mu, u_nu, jnp.zeros((), jnp.int32),
            RINTR, idxs, freeze, d_base, d_samples, step_valid, iter_offsets,
            None, (RH, RW), ND * CAP_LOC, 32, True, False, S,
            M.HashableDict(loss_cfg), render_fn=render_fn)

    def rfn_single(params, alive, w2c, intrinsics, mean2d_offset=None):
        return render_pallas(
            params.xyz, gm.get_scaling(params), gm.get_rotation_xyzw(params),
            gm.get_opacity(params), gm.get_sh(params), w2c, intrinsics,
            (RH, RW), capacity=ND * CAP_LOC, chunk=32,
            mean2d_offset=mean2d_offset, alive=alive)

    ref = run(gmap, rfn_single)

    mesh = make_mesh(ND, axis="g")
    rfn_sh = pmesh.make_gsharded_render_fn(mesh, (RH, RW),
                                           capacity_local=CAP_LOC, chunk=32)
    gmap_sh = pmesh.shard_gaussian_map(gmap, mesh)
    out = run(gmap_sh, rfn_sh)

    # per-step losses agree tightly; the map itself within Adam's
    # amplification of fp32 summation-order noise near zero gradients
    np.testing.assert_allclose(np.asarray(out[6]), np.asarray(ref[6]),
                               rtol=2e-4, atol=1e-6)
    for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
        a = np.asarray(getattr(ref[0].params, name))
        b = np.asarray(getattr(out[0].params, name))
        np.testing.assert_allclose(b, a, atol=2e-3,
                                   err_msg=f"params.{name}")
    np.testing.assert_allclose(np.asarray(out[1].exposure),
                               np.asarray(ref[1].exposure), atol=1e-5)
    ka = jax.tree.leaves(ref[2])
    kb = jax.tree.leaves(out[2])
    for a, b in zip(ka, kb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
