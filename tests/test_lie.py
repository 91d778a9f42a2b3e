"""Property tests for the pure-JAX SE3/Sim3 library.

Oracles: group identities (exp/log roundtrip, adjoint identity,
Adj(g)·xi = log(g exp(xi) g⁻¹) for small xi) and cross-checks against
scipy.spatial.transform rotations. These mirror the semantics of lietorch as
used by the reference (see SURVEY.md §2.3(b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from wildgs_slam_tpu.ops import lie


def rand_se3(key, shape=()):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, shape + (3,))
    q = jax.random.normal(k2, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


def test_quat_matches_scipy():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(lie.quat_to_matrix(q))
    theirs = R.from_quat(np.asarray(q)).as_matrix()  # scipy uses (x,y,z,w) too
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quat_act_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (16, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    p = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    via_quat = lie.quat_act(q, p)
    via_mat = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), p)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-5)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (64, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    # quaternion double cover: compare up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    xi = 0.8 * jax.random.normal(key, (64, 6))
    xi2 = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_small_angle():
    xi = jnp.array([[1e-10, 2e-10, -1e-10, 1e-10, -2e-10, 1e-10],
                    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    g = lie.se3_exp(xi)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(g[1], lie.se3_identity(), atol=1e-7)
    # grads finite through zero
    grad = jax.jacobian(lie.se3_exp)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_inverse_and_mul():
    g = rand_se3(jax.random.PRNGKey(5), (32,))
    ident = lie.se3_mul(g, lie.se3_inv(g))
    np.testing.assert_allclose(
        ident, np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (32, 1)), atol=1e-5
    )


def test_mul_matches_matrix_product():
    a = rand_se3(jax.random.PRNGKey(6), (16,))
    b = rand_se3(jax.random.PRNGKey(7), (16,))
    np.testing.assert_allclose(
        lie.se3_matrix(lie.se3_mul(a, b)),
        lie.se3_matrix(a) @ lie.se3_matrix(b),
        atol=1e-5,
    )


def test_act_matches_matrix():
    g = rand_se3(jax.random.PRNGKey(8), (16,))
    p = jax.random.normal(jax.random.PRNGKey(9), (16, 3))
    hom = jnp.concatenate([p, jnp.ones((16, 1))], axis=-1)
    via_mat = jnp.einsum("nij,nj->ni", lie.se3_matrix(g), hom)[..., :3]
    np.testing.assert_allclose(lie.se3_act(g, p), via_mat, atol=1e-5)


def test_act4_disparity_semantics():
    """act4 on (X, Y, 1, d): translation scales with d (projective_ops.py:83)."""
    g = rand_se3(jax.random.PRNGKey(10), ())
    X = jnp.array([0.3, -0.2, 1.0, 0.5])
    out = lie.se3_act4(g, X)
    # equivalent: rotate xyz, add d * t; last component unchanged
    expected_xyz = lie.quat_act(g[3:7], X[:3]) + 0.5 * g[:3]
    np.testing.assert_allclose(out[:3], expected_xyz, atol=1e-6)
    assert out[3] == pytest.approx(0.5)


def test_adjoint_identity():
    """Adj(g)·xi ≈ log(g exp(xi) g⁻¹)."""
    g = rand_se3(jax.random.PRNGKey(11), (8,))
    xi = 1e-3 * jax.random.normal(jax.random.PRNGKey(12), (8, 6))
    lhs = lie.se3_adj(g, xi)
    rhs = lie.se3_log(lie.se3_mul(lie.se3_mul(g, lie.se3_exp(xi)), lie.se3_inv(g)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)  # fp32


def test_adjT_is_transpose():
    g = rand_se3(jax.random.PRNGKey(13), ())
    a = jax.random.normal(jax.random.PRNGKey(14), (6,))
    b = jax.random.normal(jax.random.PRNGKey(15), (6,))
    lhs = jnp.dot(lie.se3_adj(g, a), b)
    rhs = jnp.dot(a, lie.se3_adjT(g, b))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_retr_left_multiply():
    g = rand_se3(jax.random.PRNGKey(16), ())
    xi = 0.1 * jax.random.normal(jax.random.PRNGKey(17), (6,))
    np.testing.assert_allclose(
        lie.se3_retr(g, xi), lie.se3_mul(lie.se3_exp(xi), g), atol=1e-6
    )


def test_sim3_roundtrip_and_action():
    g = rand_se3(jax.random.PRNGKey(18), ())
    s = jnp.array([1.7])
    G = jnp.concatenate([g, s])
    ident = lie.sim3_mul(G, lie.sim3_inv(G))
    np.testing.assert_allclose(ident, lie.sim3_identity(), atol=1e-5)
    p = jnp.array([0.2, -0.4, 1.3])
    via_mat = (lie.sim3_matrix(G) @ jnp.append(p, 1.0))[:3]
    np.testing.assert_allclose(lie.sim3_act(G, p), via_mat, atol=1e-5)


def test_sim3_exp_log():
    key = jax.random.PRNGKey(20)
    xi = 0.4 * jax.random.normal(key, (64, 7))
    G = lie.sim3_exp(xi)
    np.testing.assert_allclose(lie.sim3_log(G), xi, atol=1e-5)
    # sigma = 0 reduces exactly to SE3
    xi0 = xi.at[:, 6].set(0.0)
    np.testing.assert_allclose(lie.sim3_exp(xi0)[:, :7],
                               lie.se3_exp(xi0[:, :6]), atol=1e-6)
    # scale acts multiplicatively
    g = lie.sim3_exp(jnp.array([0., 0, 0, 0, 0, 0, np.log(2.0)]))
    p = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(lie.sim3_act(g, p), 2.0 * p, atol=1e-5)


def test_se3_wrapper_api():
    g = lie.SE3.Identity(4)
    assert g.shape == (4,)
    xi = 0.01 * jax.random.normal(jax.random.PRNGKey(19), (4, 6))
    g2 = g.retr(xi)
    np.testing.assert_allclose(g2.log(), xi, atol=1e-5)
    # pytree registration: jit through the wrapper
    out = jax.jit(lambda x: (x * jnp.ones((4, 3))))(g2)
    assert out.shape == (4, 3)
