"""Rasterizer tests: tiled pipeline vs per-pixel oracle + gradient checks.

The oracle (render_reference) implements the CUDA rasterizer's blending
semantics directly (thresholds 1/255, 0.99 clamp, 1e-4 termination — see
diff-gaussian-rasterization-w-pose, SURVEY.md §2.3(c)); the tiled path must
match it exactly. Gradients are cross-checked between the two independent
implementations (FD does not converge for rasterizers — inherent
discontinuities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgs_slam_tpu.ops import lie
from wildgs_slam_tpu.ops.rasterizer import render, render_reference


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(0)
    N, H, W = 200, 48, 64
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [jax.random.uniform(k1, (N, 2)) * 2 - 1,
         2.0 + jax.random.uniform(k2, (N, 1)) * 2], -1)
    scales = 0.02 + 0.08 * jax.random.uniform(k3, (N, 3))
    rots = jax.random.normal(k4, (N, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = 0.3 + 0.6 * jax.random.uniform(k5, (N,))
    sh = jax.random.uniform(jax.random.PRNGKey(9), (N, 1, 3))
    w2c = lie.se3_identity()
    intr = jnp.array([55.0, 55.0, W / 2, H / 2])
    return dict(means=means, scales=scales, rots=rots, opac=opac, sh=sh,
                w2c=w2c, intr=intr, H=H, W=W, N=N)


def test_tiled_matches_oracle(scene):
    s = scene
    out_t = render(s["means"], s["scales"], s["rots"], s["opac"], s["sh"],
                   s["w2c"], s["intr"], (s["H"], s["W"]), capacity=256, chunk=32)
    out_r = render_reference(s["means"], s["scales"], s["rots"], s["opac"],
                             s["sh"], s["w2c"], s["intr"], (s["H"], s["W"]))
    assert int(out_t.overflow) == 0
    np.testing.assert_allclose(out_t.color, out_r.color, atol=1e-5)
    np.testing.assert_allclose(out_t.depth, out_r.depth, atol=1e-4)
    np.testing.assert_allclose(out_t.alpha, out_r.alpha, atol=1e-5)
    np.testing.assert_array_equal(out_t.n_touched, out_r.n_touched)
    # something was actually rendered
    assert float(out_r.alpha.max()) > 0.5
    assert int((out_r.n_touched > 0).sum()) > 50


def test_gradients_match_oracle(scene):
    s = scene
    H, W = s["H"], s["W"]

    def loss(renderer, pd, m, sc, op):
        out = renderer(m, sc, s["rots"], op, s["sh"], s["w2c"], s["intr"],
                       (H, W), pose_delta=pd)
        return jnp.sum(out.color ** 2) + 0.01 * jnp.sum(out.depth ** 2)

    args = (jnp.zeros(6), s["means"], s["scales"], s["opac"])
    def lt(*a):
        return loss(lambda *r, **k: render(*r, capacity=256, chunk=32, **k), *a)
    def lr(*a):
        return loss(render_reference, *a)
    gt = jax.grad(lt, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gt, gr):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-4)
    # pose gradient is nonzero
    assert float(jnp.abs(gt[0]).max()) > 1e-3


def test_bg_blend():
    """Empty scene renders the background."""
    N = 4
    out = render(
        jnp.zeros((N, 3)) + jnp.array([0, 0, -5.0]),  # behind camera
        jnp.full((N, 3), 0.1), jnp.tile(jnp.array([0, 0, 0, 1.0]), (N, 1)),
        jnp.full((N,), 0.9), jnp.full((N, 1, 3), 0.5),
        lie.se3_identity(), jnp.array([40.0, 40.0, 16.0, 16.0]), (32, 32),
        bg=jnp.array([0.2, 0.4, 0.6]), capacity=64, chunk=32,
    )
    np.testing.assert_allclose(out.color, jnp.broadcast_to(
        jnp.array([0.2, 0.4, 0.6]), (32, 32, 3)), atol=1e-6)
    assert int(out.n_touched.sum()) == 0


def test_alive_mask(scene):
    """Dead capacity slots must not contribute."""
    s = scene
    alive = jnp.arange(s["N"]) < s["N"] // 2
    out_masked = render(s["means"], s["scales"], s["rots"], s["opac"], s["sh"],
                        s["w2c"], s["intr"], (s["H"], s["W"]), alive=alive,
                        capacity=256, chunk=32)
    out_half = render_reference(
        s["means"][: s["N"] // 2], s["scales"][: s["N"] // 2],
        s["rots"][: s["N"] // 2], s["opac"][: s["N"] // 2],
        s["sh"][: s["N"] // 2], s["w2c"], s["intr"], (s["H"], s["W"]))
    np.testing.assert_allclose(out_masked.color, out_half.color, atol=1e-5)
    assert int(out_masked.n_touched[s["N"] // 2:].sum()) == 0


def test_pose_delta_shifts_image(scene):
    """A small x-translation twist moves the rendered content."""
    s = scene
    base = render_reference(s["means"], s["scales"], s["rots"], s["opac"],
                            s["sh"], s["w2c"], s["intr"], (s["H"], s["W"]))
    shifted = render_reference(
        s["means"], s["scales"], s["rots"], s["opac"], s["sh"], s["w2c"],
        s["intr"], (s["H"], s["W"]),
        pose_delta=jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]))
    diff = float(jnp.abs(base.color - shifted.color).mean())
    assert diff > 1e-3


def test_binning_topk_matches_onehot():
    """The top_k compaction must produce identical tile tables."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 700
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([64.0, 48.0])
    radius = (1.0 + 7.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(6), (N,)) > 0.2

    a = binning.bin_gaussians(mean2d, radius, depth, valid, (48, 64),
                              capacity=64, method="onehot")
    b = binning.bin_gaussians(mean2d, radius, depth, valid, (48, 64),
                              capacity=64, method="topk")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.overflow) == int(b.overflow)


def test_binning_sort_matches_onehot():
    """The duplicate+sort compaction must produce identical tile tables
    (radii kept small enough that the 4x4-tile window never truncates)."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(15)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 900
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([96.0, 64.0])
    radius = (1.0 + 7.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(16), (N,)) > 0.25

    a = binning.bin_gaussians(mean2d, radius, depth, valid, (64, 96),
                              capacity=64, method="onehot")
    b = binning.bin_gaussians(mean2d, radius, depth, valid, (64, 96),
                              capacity=64, method="sort")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.overflow) == int(b.overflow)


def test_binning_bsearch_matches_onehot():
    """The binary-search compaction must produce identical tile tables."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(25)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 700
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([64.0, 48.0])
    radius = (1.0 + 20.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(26), (N,)) > 0.2

    a = binning.bin_gaussians(mean2d, radius, depth, valid, (48, 64),
                              capacity=64, method="onehot")
    b = binning.bin_gaussians(mean2d, radius, depth, valid, (48, 64),
                              capacity=64, method="bsearch")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.overflow) == int(b.overflow)


def test_binning_dense_rev_matches_sort():
    """onehot_rev / bsearch_rev window-truncated tables + reverse index must
    match the sort method exactly, and the reverse index must claim every
    live table slot exactly once (the gather-VJP correctness invariant)."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(35)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 600
    H, W = 64, 96
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([float(W), float(H)])
    radius = (1.0 + 30.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(36), (N,)) > 0.25

    ref = binning.bin_gaussians(mean2d, radius, depth, valid, (H, W),
                                capacity=48, method="sort", kw=4)
    for meth in ("onehot_rev", "bsearch_rev"):
        b = binning.bin_gaussians(mean2d, radius, depth, valid, (H, W),
                                  capacity=48, method=meth, kw=4)
        ids = np.asarray(b.ids)
        np.testing.assert_array_equal(np.asarray(ref.ids), ids)
        np.testing.assert_array_equal(np.asarray(ref.counts),
                                      np.asarray(b.counts))
        assert int(ref.overflow) == int(b.overflow)
        rp, rl = np.asarray(b.rev_pos), np.asarray(b.rev_live)
        flat = ids.reshape(-1)
        nn, kk = np.nonzero(rl)
        assert np.all(flat[rp[nn, kk]] == nn), meth
        claimed = np.zeros(flat.shape[0], np.int32)
        np.add.at(claimed, rp[nn, kk], 1)
        assert np.all(claimed[flat >= 0] == 1), meth
        assert np.all(claimed[flat < 0] == 0), meth


def test_binning_onehot2_matches_onehot():
    """The two-stage segmented compaction must produce identical tile tables
    when no depth-rank band overflows seg_cap (N > one 512 band so stage A
    really runs multiple bands)."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(45)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 1400  # 3 depth-rank bands of 512
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([128.0, 96.0])
    radius = (1.0 + 7.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(46), (N,)) > 0.2

    a = binning.bin_gaussians(mean2d, radius, depth, valid, (96, 128),
                              capacity=96, method="onehot")
    b = binning.bin_gaussians(mean2d, radius, depth, valid, (96, 128),
                              capacity=96, method="onehot2", seg_cap=64)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.overflow) == int(b.overflow)


def test_binning_onehot2_band_overflow_counted():
    """A depth-rank band overflowing seg_cap drops entries front-to-back and
    counts every drop in `overflow` (no silent truncation)."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    N = 600  # two 512-rank bands (N <= 512 falls back to plain onehot)
    # all gaussians on the same tile; each band keeps seg_cap front-to-back
    mean2d = jnp.tile(jnp.array([[8.0, 8.0]]), (N, 1))
    radius = jnp.ones((N,), jnp.int32)
    depth = jnp.arange(N, dtype=jnp.float32) + 1.0
    valid = jnp.ones((N,), bool)

    b = binning.bin_gaussians(mean2d, radius, depth, valid, (16, 16),
                              capacity=64, method="onehot2", seg_cap=8)
    ids = np.asarray(b.ids)[0]
    # band 0 (ranks 0..511) keeps 0..7, band 1 (ranks 512..599) keeps
    # 512..519; stage B concatenates them depth-ordered
    assert int(b.counts[0]) == 16
    np.testing.assert_array_equal(ids[:8], np.arange(8))
    np.testing.assert_array_equal(ids[8:16], 512 + np.arange(8))
    assert int(b.overflow) == N - 16


def test_binning_onehot2_scan_path_matches_onehot():
    """N > 16 bands takes the lax.scan stage-A path (the unrolled branch
    covers nb <= 16); both must agree with the one-stage compaction."""
    import numpy as np
    from wildgs_slam_tpu.ops.rasterizer import binning

    key = jax.random.PRNGKey(47)
    k1, k2, k3 = jax.random.split(key, 3)
    N = 8704  # 17 depth-rank bands of 512 -> scan path
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([128.0, 96.0])
    radius = (1.0 + 3.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(48), (N,)) > 0.3

    a = binning.bin_gaussians(mean2d, radius, depth, valid, (96, 128),
                              capacity=256, method="onehot")
    b = binning.bin_gaussians(mean2d, radius, depth, valid, (96, 128),
                              capacity=256, method="onehot2", seg_cap=128)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
