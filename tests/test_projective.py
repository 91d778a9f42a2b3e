"""Tests for projective_transform + analytic Jacobians.

Oracle: JAX autodiff of the same transform under explicit left-multiplicative
pose perturbations — this is exactly the derivative the reference's analytic
Jacobians encode (projective_ops.py:110-139, used by the DBA)."""

import jax
import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.ops import lie, projective


def make_scene(key, P=4, H=12, W=16):
    k1, k2, k3 = jax.random.split(key, 3)
    # small random motions around identity so everything stays in view
    xi = 0.05 * jax.random.normal(k1, (P, 6))
    poses = lie.se3_exp(xi)
    disps = 0.5 + 0.3 * jax.random.uniform(k2, (P, H, W))
    intrinsics = jnp.array([W * 1.2, W * 1.2, W / 2 - 0.5, H / 2 - 0.5])
    ii = jnp.array([0, 1, 2, 0])
    jj = jnp.array([1, 0, 3, 2])
    return poses, disps, intrinsics, ii, jj


def test_identity_reprojection():
    """Identical poses + self-edge baseline handling stays finite; equal poses
    on distinct frames reproject to the original grid."""
    P, H, W = 3, 8, 10
    poses = lie.se3_identity((P,))
    disps = jnp.full((P, H, W), 0.7)
    intr = jnp.array([10.0, 10.0, 4.5, 3.5])
    ii = jnp.array([0, 1])
    jj = jnp.array([1, 1])
    coords, valid = projective.projective_transform(poses, disps, intr, ii, jj)
    grid = projective.coords_grid(H, W)
    # edge 0->1 with equal poses: coords == grid
    np.testing.assert_allclose(coords[0], grid, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(coords)))
    assert np.all(np.asarray(valid) == 1.0)


def test_induced_flow_zero_for_static():
    poses = lie.se3_identity((2,))
    disps = jnp.full((2, 8, 10), 0.5)
    intr = jnp.array([10.0, 10.0, 4.5, 3.5])
    flow, valid = projective.induced_flow(
        poses, disps, intr, jnp.array([0]), jnp.array([1])
    )
    np.testing.assert_allclose(flow, 0.0, atol=1e-4)


def test_jacobians_vs_autodiff():
    poses, disps, intr, ii, jj = make_scene(jax.random.PRNGKey(0))

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True
    )

    def coords_of_perturbation(xi_all):
        # left-multiplicative perturbation of every pose: T_k' = exp(xi_k) T_k
        perturbed = lie.se3_mul(lie.se3_exp(xi_all), poses)
        c, _ = projective.projective_transform(perturbed, disps, intr, ii, jj)
        return c

    J_auto = jax.jacfwd(coords_of_perturbation)(jnp.zeros_like(poses[:, :6]))
    # J_auto: (N, H, W, 2, P, 6); analytic Ji is d coords(edge n)/d xi_{ii[n]}
    for n in range(ii.shape[0]):
        i, j = int(ii[n]), int(jj[n])
        v = np.asarray(valid[n, ..., 0]) > 0
        np.testing.assert_allclose(
            np.asarray(J_auto[n, ..., i, :])[v],
            np.asarray(Ji[n])[v],
            atol=1e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(J_auto[n, ..., j, :])[v],
            np.asarray(Jj[n])[v],
            atol=1e-3, rtol=1e-3,
        )


def test_depth_jacobian_vs_autodiff():
    poses, disps, intr, ii, jj = make_scene(jax.random.PRNGKey(1))
    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True
    )

    def coords_of_disps(d):
        c, _ = projective.projective_transform(poses, d, intr, ii, jj)
        return c

    # directional derivative along a random disparity bump on source frames
    key = jax.random.PRNGKey(2)
    dd = jax.random.normal(key, disps.shape)
    _, jvp = jax.jvp(coords_of_disps, (disps,), (dd,))
    # analytic: coords[n,h,w] changes by Jz[n,h,w,:,0] * dd[ii[n],h,w]
    pred = np.asarray(Jz[..., 0]) * np.asarray(dd)[np.asarray(ii)][..., None]
    v = np.asarray(valid[..., 0]) > 0
    np.testing.assert_allclose(np.asarray(jvp)[v], pred[v], atol=1e-3, rtol=1e-3)


def test_return_depth():
    poses, disps, intr, ii, jj = make_scene(jax.random.PRNGKey(3))
    coords, valid = projective.projective_transform(
        poses, disps, intr, ii, jj, return_depth=True
    )
    assert coords.shape[-1] == 3
    assert np.all(np.asarray(coords[..., 2]) > 0)


def test_jit_compatible():
    poses, disps, intr, ii, jj = make_scene(jax.random.PRNGKey(4))
    f = jax.jit(
        lambda p, d: projective.projective_transform(p, d, intr, ii, jj, True)
    )
    coords, valid, Js = f(poses, disps)
    assert np.all(np.isfinite(np.asarray(coords)))
