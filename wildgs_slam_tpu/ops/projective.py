"""Projective geometry ops with analytic Jacobians (pure JAX).

TPU-native equivalent of the reference's `src/geom/projective_ops.py` and the
geometry inside `src/lib/droid_kernels.cu:187-435`. Everything is expressed as
batched array math so XLA can fuse it; the per-edge batch dimension replaces
the reference's CUDA block-per-factor launch.

Conventions (identical to the reference):
  - `disps` are inverse depths (disparities) at 1/8 feature resolution.
  - `poses` are world->camera SE3 7-vectors; the relative transform used for
    reprojection of frame i pixels into frame j is
    Gij = poses[j] ∘ poses[i]⁻¹  (projective_ops.py:117).
  - Homogeneous points are (X, Y, 1, d) so that SE3 action scales the
    translation by the disparity d (act4).
  - ii == jj edges get a fixed small stereo baseline (-0.1, 0, 0)
    (projective_ops.py:119) so the Jacobians stay finite.
  - Points closer than MIN_DEPTH are masked invalid (projective_ops.py:126).

Reference files: /root/reference/src/geom/projective_ops.py:25-152.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2

# Fixed baseline substituted for self-edges (ii == jj).
_SELF_EDGE = jnp.array([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-center grid, (ht, wd, 2) with (x, y) last-dim order."""
    y, x = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    return jnp.stack([x, y], axis=-1)


def iproj(disps: jax.Array, intrinsics: jax.Array):
    """Pinhole inverse projection.

    Args:
      disps: (..., H, W) inverse depths.
      intrinsics: (..., 4) = (fx, fy, cx, cy), broadcast over H, W.
    Returns:
      pts: (..., H, W, 4) homogeneous points (X, Y, 1, d).
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, disps.dtype)
    x, y = grid[..., 0], grid[..., 1]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(Xs: jax.Array, intrinsics: jax.Array, jacobian: bool = False,
         return_depth: bool = False):
    """Pinhole projection of homogeneous points (..., 4).

    Returns coords (..., 2) or (..., 3) with inverse depth appended, plus the
    2x4 projection Jacobian if requested (projective_ops.py:53-79).
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = jnp.moveaxis(Xs, -1, 0)

    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ],
        axis=-1,
    ).reshape(d.shape + (2, 4))
    return coords, Jp


def actp(Gij: jax.Array, X0: jax.Array, jacobian: bool = False):
    """SE3 action on homogeneous point cloud with left-perturbation Jacobian.

    Gij: (..., 7) broadcast over the spatial dims of X0 (..., H, W, 4).
    Jacobian layout matches projective_ops.py:91-96: rows are the 4 point
    components, columns the 6 twist coords (tau, phi) — evaluated at the
    OUTPUT point X1.
    """
    X1 = lie.se3_act4(Gij[..., None, None, :], X0)

    if not jacobian:
        return X1, None

    X, Y, Z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    Ja = jnp.stack(
        [
            d, o, o, o, Z, -Y,
            o, d, o, -Z, o, X,
            o, o, d, Y, -X, o,
            o, o, o, o, o, o,
        ],
        axis=-1,
    ).reshape(d.shape + (4, 6))
    return X1, Ja


def relative_poses(poses: jax.Array, ii: jax.Array, jj: jax.Array) -> jax.Array:
    """Gij = poses[jj] ∘ poses[ii]⁻¹ with the self-edge baseline substitution."""
    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    self_edge = jnp.broadcast_to(_SELF_EDGE.astype(Gij.dtype), Gij.shape)
    return jnp.where((ii == jj)[..., None], self_edge, Gij)


def projective_transform(poses: jax.Array, disps: jax.Array,
                         intrinsics: jax.Array, ii: jax.Array, jj: jax.Array,
                         jacobian: bool = False, return_depth: bool = False):
    """Reproject frame-ii pixels into frame jj (projective_ops.py:110-139).

    Args:
      poses: (P, 7) world->camera SE3.
      disps: (P, H, W) inverse depths.
      intrinsics: (4,) or (P, 4) shared pinhole intrinsics at this resolution.
      ii, jj: (N,) edge endpoint indices.
    Returns:
      coords: (N, H, W, 2[+1]) target pixel coords.
      valid:  (N, H, W, 1) depth-validity mask.
      (Ji, Jj, Jz) if jacobian: (N, H, W, 2, 6) x2 and (N, H, W, 2, 1).
    """
    intrinsics = jnp.asarray(intrinsics)
    if intrinsics.ndim == 1:
        intr_i = intr_j = jnp.broadcast_to(intrinsics, ii.shape + (4,))
    else:
        intr_i, intr_j = intrinsics[ii], intrinsics[jj]

    X0 = iproj(disps[ii], intr_i)
    Gij = relative_poses(poses, ii, jj)
    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    coords, Jp = proj(X1, intr_j, jacobian=jacobian, return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH)).astype(disps.dtype)
    valid = valid[..., None]

    if not jacobian:
        return coords, valid

    # Jj = Jp @ Ja : (N,H,W,2,6); Ji transforms by the dual adjoint.
    Jj = Jp @ Ja
    AdjG = lie.se3_adj_matrix(Gij)  # (N, 6, 6)
    Ji = -jnp.einsum("nhwkj,nji->nhwki", Jj, AdjG)

    # Jz: derivative of coords wrt source disparity. d(X1)/dd = Gij act4 on
    # (0,0,0,1) = (t, 1); then through the projection Jacobian.
    tvec = Gij[..., :3]
    dX1_dd = jnp.concatenate([tvec, jnp.ones_like(tvec[..., :1])], axis=-1)
    Jz = jnp.einsum("nhwkj,nj->nhwk", Jp, dX1_dd)[..., None]  # (N,H,W,2,1)

    return coords, valid, (Ji, Jj, Jz)


def induced_flow(poses: jax.Array, disps: jax.Array, intrinsics: jax.Array,
                 ii: jax.Array, jj: jax.Array):
    """Optical flow induced by camera motion (projective_ops.py:141-152)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
