"""DBA tests.

Oracle 1 (exactness): one GN iteration must match a dense normal-equation
system built independently via jax.jacfwd over ALL window poses + disparities
(same damping scheme as geom/ba.py / chol.py), solved densely — this checks
Hessian assembly, the grouped Schur complement, and back-substitution.

Oracle 2 (convergence): BA from perturbed initialization drives reprojection
residuals down on a synthetic scene.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.ops import dba, lie, projective

F, H, W = 4, 6, 8
HW = H * W
INTR = jnp.array([8.0, 8.0, W / 2 - 0.5, H / 2 - 0.5])


def make_problem(key=0, perturb=0.02):
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    xi_gt = 0.04 * jax.random.normal(k1, (F, 6))
    poses_gt = lie.se3_exp(xi_gt)
    disps_gt = 0.5 + 0.2 * jax.random.uniform(k2, (F, H, W))

    ii = jnp.array([0, 1, 1, 2, 2, 3])
    jj = jnp.array([1, 0, 2, 1, 3, 2])
    target, _ = projective.projective_transform(poses_gt, disps_gt, INTR,
                                                ii, jj)
    weight = jnp.ones((ii.shape[0], H, W, 2))
    edge_valid = jnp.ones(ii.shape[0], bool)

    poses0 = lie.se3_mul(lie.se3_exp(perturb * jax.random.normal(k3, (F, 6))),
                         poses_gt)
    disps0 = disps_gt + perturb * jax.random.normal(
        jax.random.PRNGKey(9), (F, H, W))
    eta = jnp.full((F, H, W), 0.05)
    groups = jnp.asarray(dba.make_edge_groups(np.asarray(ii), F, 4))
    return dict(poses_gt=poses_gt, disps_gt=disps_gt, poses0=poses0,
                disps0=disps0, target=target, weight=weight, eta=eta,
                ii=ii, jj=jj, edge_valid=edge_valid, groups=groups)


def dense_oracle_step(prob, t0, t1, lm=1e-4, ep=0.1):
    """Independent dense GN step via autodiff Jacobians."""
    poses, disps = prob["poses0"], prob["disps0"]
    ii, jj = np.asarray(prob["ii"]), np.asarray(prob["jj"])
    P = t1 - t0

    def coords_of(theta):
        xi = theta[: P * 6].reshape(P, 6)
        dd = theta[P * 6:].reshape(F, H, W)
        xi_full = jnp.zeros((F, 6)).at[t0:t1].set(xi)
        p = lie.se3_mul(lie.se3_exp(xi_full), poses)
        c, _ = projective.projective_transform(p, disps + dd, INTR,
                                               prob["ii"], prob["jj"])
        return c

    theta0 = jnp.zeros(P * 6 + F * HW)
    J = jax.jacfwd(coords_of)(theta0)            # (E, H, W, 2, dim)
    E = ii.shape[0]
    J = np.asarray(J).reshape(E * HW * 2, -1)

    coords, valid = projective.projective_transform(
        poses, disps, INTR, prob["ii"], prob["jj"])
    r = np.asarray(prob["target"] - coords).reshape(-1)
    w = 0.001 * np.asarray(valid * prob["weight"]).reshape(-1)

    A = J.T @ (w[:, None] * J)
    b = J.T @ (w * r)

    # damping: pose diag *(1+lm)+ep; depth diag += eta; drop depth cols for
    # frames that are not edge sources
    n_p = P * 6
    for d in range(n_p):
        A[d, d] = A[d, d] * (1 + lm) + ep
    eta = np.asarray(prob["eta"]).reshape(-1)
    src = set(ii.tolist())
    keep = np.ones(A.shape[0], bool)
    for f in range(F):
        sl = slice(n_p + f * HW, n_p + (f + 1) * HW)
        A[sl, sl] += np.diag(eta[f * HW:(f + 1) * HW])
        if f not in src:
            keep[sl] = False
    A = A[np.ix_(keep, keep)]
    b = b[keep]
    sol = np.linalg.solve(A, b)
    dx = sol[:n_p].reshape(P, 6)
    dz_kept = sol[n_p:]
    dz = np.zeros(F * HW)
    kept_frames = [f for f in range(F) if f in src]
    for n, f in enumerate(kept_frames):
        dz[f * HW:(f + 1) * HW] = dz_kept[n * HW:(n + 1) * HW]
    return dx, dz.reshape(F, H, W)


def test_single_iteration_matches_dense_oracle():
    prob = make_problem()
    t0, t1 = 1, F
    dx_o, dz_o = dense_oracle_step(prob, t0, t1)

    poses1, disps1 = dba.ba_iteration(
        prob["poses0"], prob["disps0"], INTR, prob["target"], prob["weight"],
        prob["eta"], prob["ii"], prob["jj"], prob["edge_valid"],
        prob["groups"], t0, t1, dba.BAConfig(), pmax=F - 1)

    # recover dx from pose change: dx = log(new * old^-1)
    dx_ours = np.asarray(lie.se3_log(lie.se3_mul(
        poses1, lie.se3_inv(prob["poses0"]))))[t0:t1]
    dz_ours = np.asarray(disps1 - prob["disps0"])

    np.testing.assert_allclose(dx_ours, dx_o, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(dz_ours, dz_o, atol=2e-4, rtol=1e-3)


def test_ba_reduces_residual():
    prob = make_problem(perturb=0.05)

    def resid(poses, disps):
        c, v = projective.projective_transform(poses, disps, INTR,
                                               prob["ii"], prob["jj"])
        return float(jnp.sum(v * jnp.abs(prob["target"] - c)) / jnp.sum(v))

    r0 = resid(prob["poses0"], prob["disps0"])
    poses, disps = dba.ba(
        prob["poses0"], prob["disps0"], INTR, prob["target"], prob["weight"],
        prob["eta"], prob["ii"], prob["jj"], prob["edge_valid"],
        prob["groups"], 1, F, iters=6, pmax=F - 1)
    r1 = resid(poses, disps)
    assert r1 < 0.05 * r0, f"residual {r0:.4f} -> {r1:.4f}"


def test_motion_only_ba():
    prob = make_problem(perturb=0.03)
    # keep GT disps: motion-only should recover poses
    poses, disps = dba.ba(
        prob["poses0"], prob["disps_gt"], INTR, prob["target"],
        prob["weight"], prob["eta"], prob["ii"], prob["jj"],
        prob["edge_valid"], prob["groups"], 1, F, iters=6, motion_only=True,
        pmax=F - 1)
    np.testing.assert_array_equal(np.asarray(disps),
                                  np.asarray(prob["disps_gt"]))

    def resid(p):
        c, v = projective.projective_transform(p, prob["disps_gt"], INTR,
                                               prob["ii"], prob["jj"])
        return float(jnp.sum(v * jnp.abs(prob["target"] - c)) / jnp.sum(v))

    assert resid(poses) < 0.05 * resid(prob["poses0"])


def test_sensor_prior_pulls_disps():
    prob = make_problem(perturb=0.0)  # start at GT
    sensor = prob["disps_gt"] * 1.3   # biased prior
    poses, disps = dba.ba(
        prob["poses0"], prob["disps0"], INTR, prob["target"], prob["weight"],
        prob["eta"], prob["ii"], prob["jj"], prob["edge_valid"],
        prob["groups"], 1, F, iters=4, cfg=dba.BAConfig(alpha=10.0),
        sensor_disps=sensor, sensor_valid=jnp.ones((F, H, W), bool),
        pmax=F - 1)
    # with huge alpha the depths should move toward the sensor values
    err_to_sensor_before = float(jnp.abs(prob["disps0"] - sensor).mean())
    err_to_sensor_after = float(jnp.abs(disps - sensor).mean())
    assert err_to_sensor_after < 0.3 * err_to_sensor_before


def test_frame_distance():
    prob = make_problem()
    # identical poses -> tiny distance; distinct -> positive
    poses_same = jnp.tile(lie.se3_identity()[None], (F, 1))
    d0 = dba.frame_distance(poses_same, prob["disps_gt"], INTR,
                            jnp.array([0]), jnp.array([1]))
    assert float(d0[0]) < 1e-3
    poses_far = poses_same.at[1, 0].set(2.0)  # 2m x-shift
    d1 = dba.frame_distance_bidirectional(
        poses_far, prob["disps_gt"], INTR, jnp.array([0]), jnp.array([1]))
    assert float(d1[0]) > 1.0


def test_depth_filter_count():
    prob = make_problem()
    # consistent GT scene: every pixel should be confirmed by other frames
    count = dba.depth_filter_count(
        prob["poses_gt"], prob["disps_gt"], INTR, jnp.arange(F),
        jnp.full((F,), 0.1))
    assert count.shape == (F, H, W)
    # 6-neighbor scheme (droid_kernels.cu:705): support only from
    # {i-3..i-1, i+3..i+5}, and the tiny image loses many px out of view
    assert float((count >= 1).mean()) > 0.25
    assert int(count.max()) <= 6
    # garbage disps on frame 0 -> low counts there
    bad = prob["disps_gt"].at[0].set(5.0)
    count_bad = dba.depth_filter_count(
        prob["poses_gt"], bad, INTR, jnp.arange(F), jnp.full((F,), 0.01))
    assert float(count_bad[0].mean()) < float(count[0].mean())
