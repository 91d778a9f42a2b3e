"""Pure-JAX SE(3)/Sim(3) Lie-group library.

TPU-native replacement for the `lietorch` CUDA extension used by the reference
(WildGS-SLAM). The reference stores SE3 elements as 7-vectors
``(tx, ty, tz, qx, qy, qz, qw)`` and Sim3 as 8-vectors with a trailing scale
(see /root/reference/src/depth_video.py:47,65 and
/root/reference/src/geom/projective_ops.py:18). We keep the same storage layout
so checkpoints / trajectories interoperate, but everything here is plain
functional JAX: jit/vmap/grad-compatible, no custom kernels needed (these are
tiny elementwise ops, the VPU eats them).

API surface mirrors what the reference actually uses from lietorch:
  SE3(data), SE3.Identity, .inv(), .matrix(), group composition (`@` / mul),
  action on 3D/homogeneous points, .adj()/.adjT(), .retr(), .log(), SE3.exp,
  concatenation, Sim3 variants.

Conventions:
  - quaternion layout (x, y, z, w), Hamilton product, unit norm.
  - se3 tangent layout (tau, phi) = (vx, vy, vz, wx, wy, wz) — translation
    first, matching lietorch.
  - retraction is LEFT multiplication: retr(X, xi) = exp(xi) * X, matching
    lietorch / droid_kernels.cu:158-186 (retrSE3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle threshold for Taylor fallbacks (fp32-safe).
_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion primitives (layout: x, y, z, w)
# ---------------------------------------------------------------------------

def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, both (..., 4) in (x, y, z, w)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points p (..., 3) by unit quaternion q (..., 4)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # p' = p + 2 qw (qv × p) + 2 qv × (qv × p)
    t = 2.0 * jnp.cross(qv, p)
    return p + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) (x, y, z, w).

    Branch-free Shepperd's method via jnp.where (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    def mk(a, b, c, d):
        return jnp.stack([b, c, d, a], axis=-1)  # (x,y,z,w) with w=a

    qw = jnp.sqrt(jnp.clip(1 + tr, _EPS, None)) / 2
    q0 = mk(qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw))

    qx = jnp.sqrt(jnp.clip(1 + m00 - m11 - m22, _EPS, None)) / 2
    q1 = mk((m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx))

    qy = jnp.sqrt(jnp.clip(1 - m00 + m11 - m22, _EPS, None)) / 2
    q2 = mk((m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy))

    qz = jnp.sqrt(jnp.clip(1 - m00 - m11 + m22, _EPS, None)) / 2
    q3 = mk((m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22

    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO(3) exp/log on quaternions
# ---------------------------------------------------------------------------

def so3_exp_quat(phi: jax.Array) -> jax.Array:
    """so(3) vector (..., 3) -> unit quaternion (..., 4)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    half = 0.5 * theta
    small = theta_sq < 1e-8
    # sin(t/2)/t: Taylor 0.5 - t^2/48 for small t
    s_over = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * s_over, w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> so(3) vector (..., 3)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # Ensure shortest path (w >= 0)
    sgn = jnp.where(qw < 0, -1.0, 1.0)
    qv, qw = qv * sgn, qw * sgn
    nsq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nsq < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, nsq))
    angle = 2.0 * jnp.arctan2(n, qw)
    scale = jnp.where(small, 2.0 / jnp.clip(qw, _EPS, None), angle / n)
    return qv * scale


def _so3_left_jacobian_terms(phi: jax.Array):
    """Coefficients (A, B, C) with V = I + B·[phi]ₓ + C·[phi]ₓ², and
    rotation R = I + A·[phi]ₓ + B·[phi]ₓ² (Rodrigues)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < 1e-8
    # double-where: keep the untaken branch NaN-free so grads stay finite
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    A_big = jnp.sin(theta) / theta
    A = jnp.where(small, 1.0 - theta_sq / 6.0, A_big)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - A_big) / ts_safe)
    return A, B, C


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """V(phi) (..., 3, 3) such that exp_SE3((tau,phi)).t = V tau."""
    _, B, C = _so3_left_jacobian_terms(phi)
    Phi = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return I + B[..., None, None] * Phi + C[..., None, None] * (Phi @ Phi)


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < 1e-8
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    half = 0.5 * theta
    # coefficient of [phi]^2: (1/theta^2)(1 - A/(2B)) = 1/theta^2 - cot(theta/2)/(2 theta)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / ts_safe - jnp.cos(half) / (2.0 * theta * jnp.sin(half) + _EPS),
    )
    Phi = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return I - 0.5 * Phi + cot_term[..., None, None] * (Phi @ Phi)


# ---------------------------------------------------------------------------
# SE(3) on 7-vectors (tx, ty, tz, qx, qy, qz, qw)
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) twist (..., 6) (tau, phi) -> SE3 7-vector."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g: jax.Array) -> jax.Array:
    """SE3 7-vector -> se(3) twist (..., 6)."""
    t, q = g[..., :3], g[..., 3:7]
    phi = so3_log(q)
    Vinv = so3_left_jacobian_inv(phi)
    tau = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(g: jax.Array) -> jax.Array:
    t, q = g[..., :3], g[..., 3:7]
    qinv = quat_conj(q)
    tinv = -quat_act(qinv, t)
    return jnp.concatenate([tinv, qinv], axis=-1)


def se3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Group composition a ∘ b."""
    ta, qa = a[..., :3], a[..., 3:7]
    tb, qb = b[..., :3], b[..., 3:7]
    q = quat_mul(qa, qb)
    t = ta + quat_act(qa, tb)
    return jnp.concatenate([t, q], axis=-1)


def se3_act(g: jax.Array, p: jax.Array) -> jax.Array:
    """Act on 3D points p (..., 3)."""
    return quat_act(g[..., 3:7], p) + g[..., :3]


def se3_act4(g: jax.Array, p: jax.Array) -> jax.Array:
    """Act on homogeneous points (..., 4) = (X, Y, Z, W): rotate xyz, add W·t.

    Matches lietorch's act4 used on (X, Y, 1, d) points in
    /root/reference/src/geom/projective_ops.py:83 where the 4th component is
    the inverse depth (so translation scales by it).
    """
    xyz, w = p[..., :3], p[..., 3:4]
    out = quat_act(g[..., 3:7], xyz) + w * g[..., :3]
    w = jnp.broadcast_to(w, out.shape[:-1] + (1,))
    return jnp.concatenate([out, w], axis=-1)


def se3_matrix(g: jax.Array) -> jax.Array:
    """SE3 7-vector -> (..., 4, 4) homogeneous matrix."""
    R = quat_to_matrix(g[..., 3:7])
    t = g[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jax.Array) -> jax.Array:
    q = matrix_to_quat(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def se3_adj_matrix(g: jax.Array) -> jax.Array:
    """Adjoint (..., 6, 6): Adj = [[R, [t]ₓR], [0, R]] for (tau, phi) layout."""
    R = quat_to_matrix(g[..., 3:7])
    tR = skew(g[..., :3]) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_adj(g: jax.Array, a: jax.Array) -> jax.Array:
    """Adj(g) · a for (..., 6) tangent vectors."""
    return jnp.einsum("...ij,...j->...i", se3_adj_matrix(g), a)


def se3_adjT(g: jax.Array, a: jax.Array) -> jax.Array:
    """Adj(g)ᵀ · a; with trailing-dim-6 matrices a (..., K, 6) this equals
    a @ Adj(g), matching lietorch's adjT broadcasting
    (/root/reference/src/geom/projective_ops.py:132)."""
    return jnp.einsum("...ji,...j->...i", se3_adj_matrix(g), a)


def se3_retr(g: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative retraction: exp(xi) ∘ g (lietorch .retr)."""
    return se3_mul(se3_exp(xi), g)


def se3_normalize(g: jax.Array) -> jax.Array:
    """Renormalize the quaternion part (fights fp32 drift in long runs)."""
    t, q = g[..., :3], g[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3) on 8-vectors (tx, ty, tz, qx, qy, qz, qw, s); tangent (tau, phi, sigma)
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (8,))


def sim3_from_se3(g: jax.Array, scale=None) -> jax.Array:
    s = jnp.ones(g.shape[:-1] + (1,), g.dtype) if scale is None else scale
    return jnp.concatenate([g, s], axis=-1)


def sim3_inv(g: jax.Array) -> jax.Array:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qinv = quat_conj(q)
    sinv = 1.0 / s
    tinv = -sinv * quat_act(qinv, t)
    return jnp.concatenate([tinv, qinv, sinv], axis=-1)


def sim3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    ta, qa, sa = a[..., :3], a[..., 3:7], a[..., 7:8]
    tb, qb, sb = b[..., :3], b[..., 3:7], b[..., 7:8]
    q = quat_mul(qa, qb)
    t = ta + sa * quat_act(qa, tb)
    return jnp.concatenate([t, q, sa * sb], axis=-1)


def sim3_act(g: jax.Array, p: jax.Array) -> jax.Array:
    return g[..., 7:8] * quat_act(g[..., 3:7], p) + g[..., :3]


def sim3_act4(g: jax.Array, p: jax.Array) -> jax.Array:
    xyz, w = p[..., :3], p[..., 3:4]
    out = g[..., 7:8] * quat_act(g[..., 3:7], xyz) + w * g[..., :3]
    w = jnp.broadcast_to(w, out.shape[:-1] + (1,))
    return jnp.concatenate([out, w], axis=-1)


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) tangent (..., 7) = (tau, phi, sigma) -> Sim3 8-vector.

    Uses the similarity-transform left Jacobian W(phi, sigma) with
    t = W tau, s = exp(sigma) (standard Sim3 exponential; see e.g.
    Strasdat's thesis / lietorch sim3 kernels)."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp_quat(phi)
    s = jnp.exp(sigma)

    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    Phi = skew(phi)
    Phi2 = Phi @ Phi
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Phi.shape)

    # W = A I + B Phi + C Phi^2; four regimes (theta, sigma small/large)
    eps = 1e-4
    small_s = jnp.abs(sigma) < eps
    small_t = theta_sq < 1e-8
    sig_safe = jnp.where(small_s, 1.0, sigma)
    th_safe = jnp.where(small_t, 1.0, theta)

    A = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / sig_safe)

    # theta large (any sigma): the general formulas are sigma-regular
    denom = sigma * sigma + th_safe * th_safe
    B_full = (s * jnp.sin(th_safe) * sigma
              + (1.0 - s * jnp.cos(th_safe)) * th_safe) / (th_safe * denom)
    C_full = (A - ((s * jnp.cos(th_safe) - 1.0) * sigma
                   + s * jnp.sin(th_safe) * th_safe) / denom) / (
        th_safe * th_safe)

    # theta small: series in theta, guarded in sigma
    B_small_t = jnp.where(
        small_s, 0.5 + sigma / 3.0,
        ((sig_safe - 1.0) * s + 1.0) / (sig_safe ** 2))
    C_small_t = jnp.where(
        small_s, 1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig_safe ** 2 - sig_safe + 1.0) - 1.0) / (sig_safe ** 3))

    B = jnp.where(small_t, B_small_t, B_full)
    C = jnp.where(small_t, C_small_t, C_full)

    W = (A[..., None, None] * I + B[..., None, None] * Phi
         + C[..., None, None] * Phi2)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def sim3_log(g: jax.Array) -> jax.Array:
    """Sim3 8-vector -> sim(3) tangent (..., 7) (inverse of sim3_exp;
    W solved numerically to keep the code simple and robust)."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7]
    phi = so3_log(q)
    sigma = jnp.log(s)
    # rebuild W from (phi, sigma) (same coefficients as sim3_exp)
    probe = sim3_exp(jnp.concatenate(
        [jnp.zeros_like(t), phi, sigma[..., None]], axis=-1))
    # probe used only for its structure; compute W by differentiating the
    # linear map tau -> translation: translation = W tau, so solve W tau = t
    eye = jnp.broadcast_to(jnp.eye(3, dtype=g.dtype),
                           g.shape[:-1] + (3, 3))

    def w_col(i):
        xi = jnp.concatenate([eye[..., i], phi, sigma[..., None]], axis=-1)
        return sim3_exp(xi)[..., :3]

    W = jnp.stack([w_col(0), w_col(1), w_col(2)], axis=-1)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)


def sim3_matrix(g: jax.Array) -> jax.Array:
    R = quat_to_matrix(g[..., 3:7]) * g[..., 7:8, None]
    t = g[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Thin object wrappers (lietorch-style ergonomics, registered as pytrees)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class SE3:
    """lietorch.SE3-compatible wrapper over a (..., 7) array."""

    manifold_dim = 6
    embedded_dim = 7

    def __init__(self, data: jax.Array):
        self.data = jnp.asarray(data)

    # pytree protocol
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, idx):
        return SE3(self.data[idx])

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        return cls(se3_identity(shape, dtype))

    @classmethod
    def exp(cls, xi):
        return cls(se3_exp(xi))

    @classmethod
    def InitFromVec(cls, data):
        return cls(data)

    def inv(self):
        return SE3(se3_inv(self.data))

    def __mul__(self, other):
        if isinstance(other, SE3):
            return SE3(se3_mul(self.data, other.data))
        other = jnp.asarray(other)
        if other.shape[-1] == 4:
            return se3_act4(self.data, other)
        return se3_act(self.data, other)

    def matrix(self):
        return se3_matrix(self.data)

    def log(self):
        return se3_log(self.data)

    def retr(self, xi):
        return SE3(se3_retr(self.data, xi))

    def adj(self, a):
        return se3_adj(self.data, a)

    def adjT(self, a):
        return se3_adjT(self.data, a)

    def normalize(self):
        return SE3(se3_normalize(self.data))

    def translation(self):
        return self.data[..., :3]

    def quaternion(self):
        return self.data[..., 3:7]


@jax.tree_util.register_pytree_node_class
class Sim3:
    """lietorch.Sim3-compatible wrapper over a (..., 8) array."""

    manifold_dim = 7
    embedded_dim = 8

    def __init__(self, data: jax.Array):
        self.data = jnp.asarray(data)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.data.shape[:-1]

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        return cls(sim3_identity(shape, dtype))

    def inv(self):
        return Sim3(sim3_inv(self.data))

    def __mul__(self, other):
        if isinstance(other, Sim3):
            return Sim3(sim3_mul(self.data, other.data))
        other = jnp.asarray(other)
        if other.shape[-1] == 4:
            return sim3_act4(self.data, other)
        return sim3_act(self.data, other)

    def matrix(self):
        return sim3_matrix(self.data)


def cat(groups, axis=0):
    """lietorch.cat equivalent."""
    cls = type(groups[0])
    return cls(jnp.concatenate([g.data for g in groups], axis=axis))
