"""Correlation op tests.

Oracle 1: a literal numpy transcription of corr_index_forward_kernel
(correlation_kernels.cu:31-81) — per-pixel bilinear window sampling with
zero out-of-bounds.
Oracle 2: alt_corr (on-the-fly) must equal corr_lookup over the precomputed
pyramid — they are algebraically identical (pooling and interpolation are
linear in fmap2)."""

import jax
import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.ops import correlation as corr


def cuda_oracle_lookup(volume, coords, radius):
    """volume (E, h1*w1, h2, w2); coords (E, h1, w1, 2) -> (E, h1, w1, rd*rd).

    Direct transcription of the CUDA kernel's output definition:
    out[a, b] = bilinear(volume[pixel], (x0 - r + a, y0 - r + b))."""
    E, P, h2, w2 = volume.shape
    _, h1, w1, _ = coords.shape
    r = radius
    rd = 2 * r + 1
    out = np.zeros((E, h1, w1, rd, rd), np.float32)
    for e in range(E):
        for y in range(h1):
            for x in range(w1):
                vol = volume[e, y * w1 + x]
                x0, y0 = coords[e, y, x]
                for a in range(rd):
                    for b in range(rd):
                        xs = x0 - r + a
                        ys = y0 - r + b
                        fx, fy = np.floor(xs), np.floor(ys)
                        dx, dy = xs - fx, ys - fy
                        acc = 0.0
                        for ox, wx in ((0, 1 - dx), (1, dx)):
                            for oy, wy in ((0, 1 - dy), (1, dy)):
                                xi, yi = int(fx) + ox, int(fy) + oy
                                if 0 <= xi < w2 and 0 <= yi < h2:
                                    acc += wx * wy * vol[yi, xi]
                        out[e, y, x, a, b] = acc
    return out.reshape(E, h1, w1, rd * rd)


def test_lookup_matches_cuda_oracle():
    key = jax.random.PRNGKey(0)
    E, H, W, C = 2, 6, 8, 16
    f1 = jax.random.normal(key, (E, H, W, C))
    f2 = jax.random.normal(jax.random.PRNGKey(1), (E, H, W, C))
    pyr = corr.corr_pyramid(f1, f2, num_levels=1)
    coords = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                    jnp.arange(H, dtype=jnp.float32))[::-1],
                       axis=-1)[..., ::-1]  # (H, W, 2) x,y
    coords = jnp.tile(coords[None], (E, 1, 1, 1)) + 0.3  # subpixel shift
    ours = np.asarray(corr.corr_lookup(pyr, coords, radius=2))
    oracle = cuda_oracle_lookup(np.asarray(pyr[0]), np.asarray(coords), 2)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_alt_corr_matches_volume_path():
    key = jax.random.PRNGKey(2)
    Frames, H, W, C = 5, 8, 8, 32
    fmaps = jax.random.normal(key, (Frames, H, W, C))
    ii = jnp.array([0, 2, 3])
    jj = jnp.array([1, 4, 0])
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                     jnp.arange(H, dtype=jnp.float32), indexing="xy"),
        axis=-1)
    coords = jnp.tile(coords[None], (3, 1, 1, 1)) + jnp.array([0.4, -0.2])

    pyr_vol = corr.corr_pyramid(fmaps[ii], fmaps[jj], num_levels=4)
    via_volume = corr.corr_lookup(pyr_vol, coords, radius=3)

    pyr_f = corr.fmap_pyramid(fmaps, num_levels=4)
    via_alt = corr.alt_corr(pyr_f, coords, ii, jj, radius=3)

    np.testing.assert_allclose(np.asarray(via_volume), np.asarray(via_alt),
                               atol=2e-4)


def test_alt_corr_methods_agree():
    """vol_onehot (MXU on-the-fly volume + one-hot window) must equal the
    direct gather form bitwise-close — it is the same math reassociated."""
    key = jax.random.PRNGKey(7)
    Frames, H, W, C = 6, 8, 8, 32
    fmaps = jax.random.normal(key, (Frames, H, W, C))
    for ii, jj in ((jnp.array([0, 2, 3, 1, 4, 5, 0, 3]),   # E=8 (sub-chunked)
                    jnp.array([1, 4, 0, 5, 2, 0, 3, 1])),
                   (jnp.array([0, 2, 3]),                   # E=3 (no chunking)
                    jnp.array([1, 4, 0]))):
        E = len(ii)
        coords = jnp.stack(
            jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32), indexing="xy"),
            axis=-1)
        coords = jnp.tile(coords[None], (E, 1, 1, 1)) + jnp.array([0.4, -0.2])
        pyr = corr.fmap_pyramid(fmaps, num_levels=4)
        a = corr.alt_corr(pyr, coords, ii, jj, radius=3, method="gather")
        b = corr.alt_corr(pyr, coords, ii, jj, radius=3, method="vol_onehot")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_corr_scaling():
    """Correlation scaled by 1/16 (corr.py:85-86)."""
    f = jnp.ones((1, 4, 4, 16))
    pyr = corr.corr_pyramid(f, f, num_levels=1)
    np.testing.assert_allclose(np.asarray(pyr[0][0, 0, 0, 0]), 16 / 16.0,
                               atol=1e-6)


def test_lookup_differentiable():
    key = jax.random.PRNGKey(3)
    E, H, W, C = 1, 6, 6, 8
    f1 = jax.random.normal(key, (E, H, W, C))
    f2 = jax.random.normal(jax.random.PRNGKey(4), (E, H, W, C))

    def loss(f2):
        pyr = corr.corr_pyramid(f1, f2, num_levels=2)
        coords = jnp.full((E, H, W, 2), 2.5)
        return jnp.sum(corr.corr_lookup(pyr, coords) ** 2)

    g = jax.grad(loss)(f2)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
