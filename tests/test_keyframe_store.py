"""Unit tests for KeyframeStore operations not covered by the integration
tests: normalize, mono-depth consistency filter, depth/pose readout,
uncertainty refresh semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.models.uncertainty import init_uncertainty_mlp
from wildgs_slam_tpu.ops import lie
from wildgs_slam_tpu.slam import keyframe_store as kstore

HT, WD = 64, 64


def make_store(n=4):
    intr = np.array([50.0, 50.0, WD / 2, HT / 2])
    store = kstore.create(8, HT, WD, intr)
    for i in range(n):
        store = kstore.append(
            store, i, float(i),
            pose=lie.se3_exp(jnp.asarray([0.05 * i, 0, 0, 0, 0, 0])),
            disp=jnp.full((HT // 8, WD // 8), 0.5 + 0.1 * i),
            mono_depth_up=jnp.full((HT, WD), 2.0))
    return store


def test_append_mono_inversion():
    store = make_store()
    # mono depth 2.0 -> disparity 0.5 at both resolutions
    np.testing.assert_allclose(np.asarray(store.mono_disps_up[0]), 0.5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(store.mono_disps[0]), 0.5,
                               atol=1e-6)
    # zero/invalid depth -> zero disparity
    store2 = kstore.append(store, 5, 5.0,
                           mono_depth_up=jnp.zeros((HT, WD)))
    assert float(jnp.abs(store2.mono_disps_up[5]).sum()) == 0.0


def test_normalize_preserves_geometry():
    store = make_store()
    n = 4
    # reprojection is invariant under the depth/translation gauge rescale
    ii, jj = jnp.array([0, 1]), jnp.array([1, 2])
    c_before, _ = kstore.reproject(store, ii, jj)
    store2 = kstore.normalize(store, n)
    c_after, _ = kstore.reproject(store2, ii, jj)
    np.testing.assert_allclose(np.asarray(c_before), np.asarray(c_after),
                               atol=1e-3)
    # mean disparity is now ~1
    m = float(store2.disps[:n].mean())
    assert abs(m - 1.0) < 1e-4


def test_get_depth_and_pose():
    store = make_store()
    depth, mask, c2w = kstore.get_depth_and_pose(store, 1,
                                                 metric_depth_reg=True)
    np.testing.assert_allclose(np.asarray(depth), 2.0, atol=1e-5)
    assert bool(mask.all())
    np.testing.assert_allclose(
        np.asarray(c2w), np.asarray(lie.se3_inv(store.poses[1])), atol=1e-6)


def test_filter_high_err_mono_depth_flags_inconsistent():
    store = make_store()
    # make frame 0's mono depth inconsistent with frames 1..3 (all see 2.0)
    bad = jnp.full((HT, WD), 1.0)  # claims 1m where others imply 2m
    store = kstore.append(store, 0, 0.0, mono_depth_up=bad)

    feats = jnp.ones((HT, WD, 8))  # identical features -> cosine 1
    store2 = kstore.filter_high_err_mono_depth(
        store, 0, [1, 2, 3], feats, jnp.stack([feats] * 3))
    masked_frac = 1.0 - float(store2.mono_mask_up[0].mean())
    assert masked_frac > 0.3, f"only {masked_frac:.2f} masked"
    # consistent frame untouched
    store3 = kstore.filter_high_err_mono_depth(
        store, 1, [2, 3], feats, jnp.stack([feats] * 2))
    assert float(store3.mono_mask_up[1].mean()) > 0.95


def test_update_uncertainties_range():
    store = make_store()
    mlp, params = init_uncertainty_mlp(jax.random.PRNGKey(0), in_dim=16)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, HT // 14, WD // 14,
                                                      16))
    store2 = kstore.update_uncertainties(
        store, lambda f: mlp.apply(params, f), feats, jnp.array([0, 1]),
        train_frac_fix=0.3)
    inv = np.asarray(store2.uncertainties_inv[:2])
    assert np.all((inv >= 0.0) & (inv <= 1.0))
    # untouched frames keep weight 1
    assert np.allclose(np.asarray(store2.uncertainties_inv[2]), 1.0)


def test_backproject_pointcloud():
    store = make_store()
    # set known disps_up: depth 2m everywhere
    store = store._replace(disps_up=store.disps_up.at[0].set(0.5))
    pts, valid = kstore.backproject_pointcloud(store, 0, up=True)
    assert bool(valid.all())
    # identity pose shifted by se3_exp([0,0,0...]) for i=0 -> z == 2
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0, atol=1e-5)


def test_reprojection_map():
    store = make_store()
    coords, valid = kstore.reprojection_map(store, [0], [1])
    assert coords.shape[-1] == 3  # (x, y, inv depth)
    assert np.all(np.isfinite(np.asarray(coords)))
