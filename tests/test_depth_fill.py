"""Golden tests for the Splat-SLAM mono-depth fill (non-metric-depth
mapping branch, reference mapper.py:586-646 + depth_video.py:375-385)."""

import numpy as np

from wildgs_slam_tpu.slam import depth_fill


def _naive_erosion(binary, iterations):
    """Independent oracle: pad-protected 3x3 erosion by explicit loops."""
    b = np.pad(np.asarray(binary, bool), iterations, constant_values=True)
    for _ in range(iterations):
        out = np.zeros_like(b)
        H, W = b.shape
        for y in range(H):
            for x in range(W):
                y0, y1 = max(0, y - 1), min(H, y + 2)
                x0, x1 = max(0, x - 1), min(W, x + 2)
                # out-of-image neighbors are False (scipy border default)
                out[y, x] = b[y0:y1, x0:x1].all() and (
                    y - 1 >= 0 and y + 1 < H and x - 1 >= 0 and x + 1 < W)
        b = out
    return b[iterations:-iterations, iterations:-iterations]


def test_erosion_matches_naive_oracle():
    rng = np.random.RandomState(0)
    binary = rng.rand(24, 30) > 0.25
    got = depth_fill.binary_erosion_padded(binary, iterations=5)
    want = _naive_erosion(binary, 5)
    np.testing.assert_array_equal(got, want)


def test_erosion_border_protected():
    # an all-true mask survives: the pad ring protects the borders
    binary = np.ones((20, 20), bool)
    got = depth_fill.binary_erosion_padded(binary, iterations=5)
    assert got.all()


def test_inpaint_preserves_known_and_fills_holes():
    rng = np.random.RandomState(1)
    yy, xx = np.meshgrid(np.arange(32), np.arange(40), indexing="ij")
    depth = (2.0 + 0.01 * xx + 0.02 * yy).astype(np.float32)
    hole = np.zeros_like(depth, bool)
    hole[10:16, 12:20] = True
    broken = np.where(hole, 0.0, depth).astype(np.float32)
    filled = depth_fill.inpaint_ns(broken, hole)
    np.testing.assert_allclose(filled[~hole], depth[~hole], atol=1e-5)
    # NS/diffusion reconstructs a smooth ramp closely
    assert np.abs(filled[hole] - depth[hole]).max() < 0.15
    assert np.isfinite(filled).all()


def test_fill_recovers_scale_shift_and_fills_invalid():
    rng = np.random.RandomState(2)
    H, W = 48, 64
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    true_depth = (2.0 + 0.01 * xx + 0.005 * yy).astype(np.float32)

    est = true_depth.copy()
    valid = np.ones((H, W), bool)
    valid[20:30, 20:40] = False       # frontend holes to be mono-filled

    # mono prior = affine transform of the truth (scale 0.5, shift 0.3)
    mono = (true_depth - 0.3) / 0.5

    filled, invalid, scale, shift = depth_fill.splat_slam_fill(
        est, valid, mono)
    assert not invalid
    np.testing.assert_allclose(scale, 0.5, atol=1e-3)
    np.testing.assert_allclose(shift, 0.3, atol=1e-3)
    # valid pixels keep the frontend depth; holes get aligned mono depth
    np.testing.assert_allclose(filled[valid], est[valid], atol=1e-6)
    np.testing.assert_allclose(filled[~valid], true_depth[~valid], atol=5e-3)


def test_fill_outlier_mono_cleaned():
    H, W = 40, 50
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    est = (2.0 + 0.01 * xx).astype(np.float32)
    valid = np.ones((H, W), bool)
    valid[5:12, 5:12] = False
    mono = est.copy()
    mono[0, 0] = 1e6                  # > 4x mean -> zeroed + inpainted
    filled, invalid, scale, shift = depth_fill.splat_slam_fill(
        est, valid, mono)
    assert not invalid
    assert np.isfinite(filled).all()
    assert filled.max() < 10.0


def test_fill_invalid_keyframe():
    H, W = 30, 40
    est = np.full((H, W), 3.0, np.float32)
    valid = np.zeros((H, W), bool)
    valid[0, :50 // 2] = True        # 20 < 100 valid pixels
    mono = np.full((H, W), 1.0, np.float32)
    filled, invalid, _, _ = depth_fill.splat_slam_fill(est, valid, mono)
    assert invalid
    # invalid pixels zeroed, valid kept (mapper.py:602)
    assert (filled[~valid] == 0).all()
    np.testing.assert_allclose(filled[valid], 3.0)
