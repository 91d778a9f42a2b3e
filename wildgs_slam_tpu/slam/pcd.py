"""Keyframe -> Gaussian seeding: back-projection + downsample + scale init.

TPU-native equivalent of create_pcd_from_image_and_depth
(gaussian_model.py:138-226), which uses open3d RGBD back-projection, random
1/downsample_factor subsampling, and distCUDA2 scale init. Here it is one
jittable function with a fixed output budget M = ceil(H*W / factor): random
subsampling becomes top-M by random priority over valid-depth pixels, knn is
the exact (M, M) version in ops/knn.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import knn, lie, sh
from .gaussian_map import GaussianParams, inverse_sigmoid


@partial(jax.jit, static_argnames=("downsample_factor", "num_sh_rest",
                                   "isotropic", "adaptive_pointsize",
                                   "max_depth"))
def seed_gaussians_from_depth(
    key: jax.Array,
    color: jax.Array,        # (H, W, 3) in [0, 1] (exposure-corrected)
    depth: jax.Array,        # (H, W) metric depth, 0/neg = invalid
    w2c: jax.Array,          # (7,) SE3
    intrinsics: jax.Array,   # (4,) fx fy cx cy
    downsample_factor: int,
    point_size: float,
    num_sh_rest: int,
    isotropic: bool,
    adaptive_pointsize: bool = True,
    max_depth: float = 100.0,
) -> tuple[GaussianParams, jax.Array]:
    """Returns (params (M, ...), valid_mask (M,)) ready for gaussian_map.extend."""
    H, W = depth.shape
    M = -(-(H * W) // downsample_factor)

    valid = (depth > 0) & (depth < max_depth) & jnp.isfinite(depth)

    # random subsample: top-M smallest random priority among valid pixels
    pri = jax.random.uniform(key, (H * W,)) + jnp.where(valid.reshape(-1), 0.0, 10.0)
    neg_top, idx = jax.lax.top_k(-pri, M)
    sel_valid = (-neg_top) < 1.0  # picked a valid pixel

    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    d = depth.reshape(-1)[idx]
    rgb = color.reshape(-1, 3)[idx]

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    pts_cam = jnp.stack(
        [(xs - cx) / fx * d, (ys - cy) / fy * d, d], axis=-1)
    c2w = lie.se3_inv(w2c)
    pts_world = lie.se3_act(c2w[None], pts_cam)

    # adaptive point size (gaussian_model.py:144-150): min(0.05, ps * median)
    if adaptive_pointsize:
        med = jnp.median(jnp.where(valid, depth, jnp.nan))
        med = jnp.nan_to_num(med, nan=1.0)
        ps = jnp.minimum(0.05, point_size * med)
    else:
        ps = jnp.float32(point_size)

    dist2 = jnp.clip(knn.knn_dist2(pts_world, sel_valid), 1e-7, None) * ps
    log_scale = 0.5 * jnp.log(dist2)[:, None]  # log(sqrt(dist2))
    scaling = log_scale if isotropic else jnp.tile(log_scale, (1, 3))

    params = GaussianParams(
        xyz=pts_world,
        f_dc=sh.rgb_to_sh(rgb)[:, None, :],
        f_rest=jnp.zeros((M, num_sh_rest, 3)),
        opacity=jnp.full((M, 1), inverse_sigmoid(0.5)),
        scaling=scaling,
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (M, 1)),
    )
    return params, sel_valid
