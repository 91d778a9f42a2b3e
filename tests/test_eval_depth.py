"""Depth-L1 eval (Splat-SLAM protocol, depth_video.py:514-563)."""

import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.slam import keyframe_store as kstore
from wildgs_slam_tpu.utils.eval_depth import eval_depth_l1

HT, WD = 32, 40


class FakeStream:
    def __init__(self, depths):
        self.depths = depths

    def __getitem__(self, i):
        return float(i), None, self.depths[i], None


def make_store(n, depth_fn):
    store = kstore.create(8, HT, WD, np.array([40.0, 40, 20, 16]))
    for i in range(n):
        d = depth_fn(i)
        store = store._replace(
            timestamp=store.timestamp.at[i].set(float(i)),
            disps_up=store.disps_up.at[i].set(1.0 / d),
            valid_depth_mask=store.valid_depth_mask.at[i].set(True))
    return store


def test_perfect_depth_gives_zero_l1():
    yy, xx = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    gt = [2.0 + 0.01 * (xx + yy * (i + 1)) for i in range(3)]
    gt = [g.astype(np.float32) for g in gt]
    store = make_store(3, lambda i: jnp.asarray(gt[i]))
    l1, l1_4m, cov = eval_depth_l1(store, 3, FakeStream(gt))
    assert l1 < 1e-5 and l1_4m < 1e-5
    assert cov == 1.0


def test_scale_shift_invariance_and_bias():
    """Estimated depth = 0.5*gt + 0.3 must align to ~zero L1; an additive
    non-affine corruption must show up."""
    yy, xx = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    gt = [(2.0 + 0.02 * xx + 0.01 * yy).astype(np.float32)]
    est = 0.5 * gt[0] + 0.3
    store = make_store(1, lambda i: jnp.asarray(est))
    l1, _, _ = eval_depth_l1(store, 1, FakeStream(gt))
    assert l1 < 1e-4, l1

    bad = est + 0.2 * np.sin(xx).astype(np.float32)
    store2 = make_store(1, lambda i: jnp.asarray(bad))
    l1b, _, _ = eval_depth_l1(store2, 1, FakeStream(gt))
    assert l1b > 0.05

    # global_scale path: no shift correction allowed
    store3 = make_store(1, lambda i: jnp.asarray(2.0 * gt[0]))
    l1c, _, _ = eval_depth_l1(store3, 1, FakeStream(gt), global_scale=0.5)
    assert l1c < 1e-5


def test_4m_cut():
    yy, xx = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    gt = [(2.0 + 0.02 * xx).astype(np.float32)]
    gt[0][:, :20] = 6.0  # beyond the 4m cut
    est = gt[0].copy()
    est[:, :20] = 60.0   # grossly wrong ONLY where gt >= 4m
    store = make_store(1, lambda i: jnp.asarray(est))
    l1, l1_4m, cov = eval_depth_l1(store, 1, FakeStream(gt))
    # full eval sees the far-region error (scale/shift absorbs some of it);
    # the <4m eval is unaffected
    assert l1 > 0.01, l1
    assert l1_4m < 1e-4, l1_4m
    assert l1 > 100 * max(l1_4m, 1e-6)
