"""Gaussian projection: 3D -> screen-space (pure JAX, fully differentiable).

TPU-native re-design of the preprocess stage of
`diff-gaussian-rasterization-w-pose` (the MonoGS CUDA fork used by the
reference, see SURVEY.md §2.3(c)). Per-Gaussian work is batched array math —
XLA maps it onto the VPU/MXU; no per-thread code.

Camera pose gradients: instead of hand-derived dL/dtheta, dL/drho kernels, we
apply the pose delta with the SE3 retraction exp((rho, theta)) ∘ T_w2c and let
autodiff produce exactly the same left-perturbation gradients (the CUDA fork
computes these analytically; MonoGS applies them via SE3_exp in
/root/reference/src/utils/pose_utils.py:81-98).

Pixel convention matches the CUDA rasterizer's ndc2Pix: pix = fx·x/z + cx - 0.5
so that golden tests against reference renders line up.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from .. import sh as sh_utils


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians, one entry per input Gaussian (masked)."""

    mean2d: jax.Array     # (N, 2) pixel coords
    depth: jax.Array      # (N,) camera-space z
    conic: jax.Array      # (N, 3) upper-triangular inverse 2D covariance
    color: jax.Array      # (N, 3) view-dependent RGB
    opacity: jax.Array    # (N,) post-activation opacity
    radius: jax.Array     # (N,) int32 3-sigma screen radius (0 => culled)
    valid: jax.Array      # (N,) bool


def compute_cov3d(scales: jax.Array, rotations: jax.Array) -> jax.Array:
    """Σ = R S Sᵀ Rᵀ from per-axis scales (N,3) and unit quaternions (N,4)
    in (x, y, z, w) layout. Returns (N, 3, 3)."""
    R = lie.quat_to_matrix(rotations)
    M = R * scales[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    sh_coeffs: jax.Array,
    w2c: jax.Array,
    intrinsics: jax.Array,
    image_size: tuple[int, int],
    sh_degree: int = 0,
    pose_delta: jax.Array | None = None,
    scale_modifier: float = 1.0,
    near: float = 0.2,
) -> ProjectedGaussians:
    """Project Gaussians into a pinhole camera.

    Args:
      means3d: (N, 3) world-space centers.
      scales: (N, 3) post-activation (positive) scales.
      rotations: (N, 4) unit quaternions (x, y, z, w).
      opacities: (N,) post-activation opacities in [0, 1].
      sh_coeffs: (N, K, 3) spherical-harmonic coefficients, K=(deg+1)^2.
      w2c: (7,) world->camera SE3.
      intrinsics: (4,) = (fx, fy, cx, cy).
      image_size: (H, W).
      pose_delta: optional (6,) twist (rho, theta) retracted onto w2c; pass
        zeros and differentiate w.r.t. it for camera-pose gradients.
    """
    H, W = image_size
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]

    if pose_delta is not None:
        w2c = lie.se3_retr(w2c, pose_delta)

    # camera-space centers
    t = lie.se3_act(w2c[None, :], means3d)  # (N, 3)
    tz = t[..., 2]

    # EWA: clamp the frustum-projected position used for the affine Jacobian
    # (same 1.3x tan-fov clamping as the CUDA preprocess).
    tanfovx = (0.5 * W) / fx
    tanfovy = (0.5 * H) / fy
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    txz = jnp.clip(t[..., 0] / tz_safe, -limx, limx) * tz_safe
    tyz = jnp.clip(t[..., 1] / tz_safe, -limy, limy) * tz_safe

    # affine Jacobian of the projection at the (clamped) center.
    #
    # The 2D covariance JW Σ JWᵀ (JW = J·Rcw, Σ = M Mᵀ, M = R·diag(s)) is
    # computed CHANNELWISE on (N,) arrays rather than as batched (N,2,3)/
    # (N,3,3) matmuls: XLA lowers tiny-batched dots by padding the 3-wide
    # contraction onto MXU tiles (>40x wasted lanes) — the round-3 traces put
    # projection at ~0.5 ms (bench) / ~6 ms (mapping scale) mostly here.
    # With p = Mᵀu, q = Mᵀv (u, v = the two rows of J·Rcw):
    #   cov2d = [[p·p, p·q], [p·q, q·q]]   — exact same math, pure VPU.
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z2

    Rcw = lie.quat_to_matrix(w2c[3:7])  # (3, 3) world->camera rotation
    # u = j00·Rcw[0] + j02·Rcw[2];  v = j11·Rcw[1] + j12·Rcw[2]   (N, 3) as
    # three (N,) channels each
    u = [j00 * Rcw[0, k] + j02 * Rcw[2, k] for k in range(3)]
    v = [j11 * Rcw[1, k] + j12 * Rcw[2, k] for k in range(3)]

    # rotation channels R[i][j] of each gaussian (elementwise quat algebra)
    qx, qy, qz, qw = (rotations[:, 0], rotations[:, 1], rotations[:, 2],
                      rotations[:, 3])
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    R = [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
         [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
         [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]
    s = [scales[:, k] * scale_modifier for k in range(3)]

    # p_j = s_j · Σ_i R[i][j]·u_i ;  q_j likewise with v
    p = [s[j] * (R[0][j] * u[0] + R[1][j] * u[1] + R[2][j] * u[2])
         for j in range(3)]
    q = [s[j] * (R[0][j] * v[0] + R[1][j] * v[1] + R[2][j] * v[2])
         for j in range(3)]

    # low-pass dilation (ensures every splat covers >= ~1 pixel)
    a = p[0] * p[0] + p[1] * p[1] + p[2] * p[2] + 0.3
    b = p[0] * q[0] + p[1] * q[1] + p[2] * q[2]
    c = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma screen radius from the larger eigenvalue
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1)).astype(jnp.int32)

    # pixel coords (CUDA ndc2Pix convention)
    mean2d = jnp.stack(
        [fx * t[..., 0] * inv_z + cx - 0.5, fy * t[..., 1] * inv_z + cy - 0.5],
        axis=-1,
    )

    # view-dependent color
    cam_center = lie.se3_inv(w2c)[:3]
    dirs = means3d - cam_center[None, :]
    color = sh_utils.eval_sh(sh_degree, sh_coeffs, dirs)
    color = jnp.maximum(color + 0.5, 0.0)

    # frustum/degeneracy culling
    in_image = (
        (mean2d[..., 0] + radius > 0)
        & (mean2d[..., 0] - radius < W)
        & (mean2d[..., 1] + radius > 0)
        & (mean2d[..., 1] - radius < H)
    )
    valid = (tz > near) & (det > 0) & in_image
    radius = jnp.where(valid, radius, 0)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        color=color,
        opacity=opacities,
        radius=radius,
        valid=valid,
    )
