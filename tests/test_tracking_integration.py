"""Tracking front-end integration smoke tests.

With random (untrained) DROID weights the GRU cannot produce meaningful
flow, so these tests validate the MACHINERY end-to-end: keyframe creation,
factor-graph topology management, the jitted update core (reproject -> corr
-> GRU -> DBA -> upsample), keyframe removal/shifting, and the global-BA
path — all on a tiny synthetic sequence. Numerical convergence of BA itself
is covered by test_dba.py with ground-truth targets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.models import droid_net
from wildgs_slam_tpu.slam import keyframe_store as kstore
from wildgs_slam_tpu.slam.backend import Backend
from wildgs_slam_tpu.slam.factor_graph import FactorGraph
from wildgs_slam_tpu.slam.frontend import Frontend
from wildgs_slam_tpu.slam.motion_filter import MotionFilter
from wildgs_slam_tpu.slam.state import SlamState

HT, WD = 48, 64


@pytest.fixture(scope="module")
def cfg():
    c = load_config("configs/wildgs_slam.yaml")
    c["tracking"]["buffer"] = 32
    c["tracking"]["warmup"] = 5
    c["tracking"]["frontend"]["window"] = 8
    c["tracking"]["frontend"]["max_factors"] = 48
    c["tracking"]["frontend"]["enable_loop"] = False
    return c


@pytest.fixture(scope="module")
def params():
    return droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)


def synth_image(t):
    """Moving gradient + blobs so fnet features vary with t."""
    y, x = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    img = np.stack([
        0.5 + 0.5 * np.sin(0.2 * (x - 3 * t)),
        0.5 + 0.5 * np.cos(0.15 * (y + 2 * t)),
        0.5 + 0.4 * np.sin(0.1 * (x + y - t)),
    ], -1).astype(np.float32)
    return np.clip(img, 0, 1)


def make_state(cfg):
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    return SlamState.create(cfg, HT, WD, intr,
                            buffer=cfg["tracking"]["buffer"])


def test_motion_filter_appends(cfg, params):
    state = make_state(cfg)
    mf = MotionFilter(state, params, thresh=1e9,
                      force_keyframe_every_n_frames=2,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    for t in range(5):
        mf.track(float(t), synth_image(t))
    # first frame + forced every 2 frames (t=2, t=4)
    assert state.counter == 3
    assert float(state.store.timestamp[1]) == 2.0
    # store got features
    assert float(jnp.abs(state.store.fmaps[0]).sum()) > 0
    assert float(jnp.abs(state.store.mono_disps[1]).sum()) > 0


def test_motion_filter_fused_matches_legacy(cfg, params):
    """The fused one-dispatch step (motion_filter._fused_step) must make the
    SAME keyframe decisions and store writes as the legacy multi-dispatch
    path it replaces."""
    import wildgs_slam_tpu.slam.motion_filter as mfmod

    def drive(fused):
        state = make_state(cfg)
        mf = MotionFilter(state, params, thresh=0.05,
                          force_keyframe_every_n_frames=4,
                          depth_fn=lambda im: np.full((HT, WD), 2.0,
                                                      np.float32))
        mf.fused = fused
        for t in range(7):
            mf.track(float(t), synth_image(t))
        return state

    sa = drive(True)
    sb = drive(False)
    assert sa.counter == sb.counter
    n = sa.counter
    np.testing.assert_allclose(np.asarray(sa.store.timestamp[:n]),
                               np.asarray(sb.store.timestamp[:n]))
    # fused path normalizes INSIDE the program -> XLA fuses it into the
    # first conv with different rounding than the legacy eager normalize;
    # ~1e-5-class fp noise on O(1) features, not a semantic difference
    np.testing.assert_allclose(np.asarray(sa.store.fmaps[:n]),
                               np.asarray(sb.store.fmaps[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.store.nets[:n]),
                               np.asarray(sb.store.nets[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.store.inps[:n]),
                               np.asarray(sb.store.inps[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sa.store.mono_disps[:n]),
                               np.asarray(sb.store.mono_disps[:n]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.store.poses[:n]),
                               np.asarray(sb.store.poses[:n]), atol=1e-6)


def test_factor_graph_lifecycle(cfg, params):
    state = make_state(cfg)
    mf = MotionFilter(state, params, thresh=-1.0,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    for t in range(6):
        mf.track(float(t), synth_image(t))
    assert state.counter == 6

    g = FactorGraph(state, params, max_factors=48, pmax=16)
    g.add_neighborhood_factors(0, 6, r=2)
    n0 = len(g.ii)
    assert n0 > 0
    # duplicate filtering
    g.add_factors([0], [1])
    assert len(g.ii) == n0

    g.update(1, use_inactive=True)
    assert np.all(np.isfinite(np.asarray(g.target)))
    assert np.all(np.isfinite(np.asarray(state.store.poses)))
    assert np.all(np.asarray(state.store.disps) >= 1e-5)
    assert np.all(g.age == 1)

    # removal with storage
    mask = np.zeros(len(g.ii), bool)
    mask[:4] = True
    g.rm_factors(mask, store=True)
    assert len(g.ii) == n0 - 4
    assert len(g.ii_inac) == 4

    # keyframe removal shifts indices: edges touching the removed frame are
    # dropped; edges above it are renumbered down (old frame 4 becomes 3)
    poses_before = np.asarray(state.store.poses)
    n_before = len(g.ii)
    n_touching = int(((g.ii == 3) | (g.jj == 3)).sum())
    g.rm_keyframe(3)
    assert np.allclose(np.asarray(state.store.poses)[3], poses_before[4])
    assert len(g.ii) == n_before - n_touching
    assert (g.ii.max() if len(g.ii) else 0) <= 4  # 6 frames -> max index 4


def test_frontend_initialization(cfg, params):
    state = make_state(cfg)
    mf = MotionFilter(state, params, thresh=-1.0,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    fe = Frontend(state, params, cfg)
    for t in range(cfg["tracking"]["warmup"] + 2):
        mf.track(float(t), synth_image(t))
        fe(False)
    assert fe.is_initialized
    assert len(fe.graph.ii) > 0
    assert np.all(np.isfinite(np.asarray(state.store.poses)))
    # valid-depth masks were computed
    assert state.store.valid_depth_mask.dtype == bool


def test_backend_dense_ba(cfg, params):
    state = make_state(cfg)
    mf = MotionFilter(state, params, thresh=-1.0,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    for t in range(8):
        mf.track(float(t), synth_image(t))
    be = Backend(state, params, cfg)
    n, n_edges = be.dense_ba(steps=1)
    assert n == 8
    assert n_edges > 0
    assert np.all(np.isfinite(np.asarray(state.store.poses)))
    assert np.all(np.isfinite(np.asarray(state.store.disps)))


def test_uncertainty_mask_update(cfg, params):
    from wildgs_slam_tpu.models.uncertainty import init_uncertainty_mlp

    state = make_state(cfg)
    mf = MotionFilter(
        state, params, thresh=-1.0,
        depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32),
        feat_fn=lambda im: np.random.RandomState(0).rand(
            HT // 14, WD // 14, 384).astype(np.float32))
    for t in range(3):
        mf.track(float(t), synth_image(t))

    mlp, mlp_params = init_uncertainty_mlp(jax.random.PRNGKey(1))
    feats = jnp.asarray(state.dino_feats[:3])
    state.store = kstore.update_uncertainties(
        state.store, lambda f: mlp.apply(mlp_params, f), feats,
        jnp.arange(3), train_frac_fix=0.3)
    inv = np.asarray(state.store.uncertainties_inv[:3])
    assert np.all((inv >= 0) & (inv <= 1))
    assert not np.allclose(inv, 1.0)  # actually updated


def test_update_n_matches_sequential(cfg, params):
    """update_n(2) (one while_loop dispatch) == two sequential update()
    calls, and a huge eps early-exits after one iteration (VERDICT r2
    next-step 1: batched frontend updates)."""

    def mkgraph():
        state = make_state(cfg)
        mf = MotionFilter(state, params, thresh=-1.0,
                          depth_fn=lambda im: np.full((HT, WD), 2.0,
                                                      np.float32))
        for t in range(6):
            mf.track(float(t), synth_image(t))
        g = FactorGraph(state, params, max_factors=16, pmax=16)
        g.add_neighborhood_factors(0, 6, r=2)
        return g

    ga = mkgraph()
    ga.update(1, use_inactive=True)
    ga.update(1, use_inactive=True)

    gb = mkgraph()
    n_done, dmean = gb.update_n(2, 1, use_inactive=True, eps=0.0)
    assert int(n_done) == 2 and float(dmean) > 0
    np.testing.assert_allclose(np.asarray(gb.state.store.poses),
                               np.asarray(ga.state.store.poses), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb.state.store.disps),
                               np.asarray(ga.state.store.disps), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb.state.store.disps_up),
                               np.asarray(ga.state.store.disps_up),
                               atol=1e-5)
    b = 32
    np.testing.assert_allclose(np.asarray(gb.target[:b]),
                               np.asarray(ga.target[:b]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb.net[:b]),
                               np.asarray(ga.net[:b]), atol=1e-4)

    gc = mkgraph()
    n_done, _ = gc.update_n(8, 1, use_inactive=True, eps=1e9)
    assert int(n_done) == 1
