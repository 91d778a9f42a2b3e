"""Tests for the fixed-capacity GaussianMap (extend/densify/prune/adam/ply).

Oracle: the reference GaussianModel's semantics (gaussian_model.py:495-749):
appended points get zeroed Adam state, split children inherit scaled
parameters, prune clears slots, stats reset after densification."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from wildgs_slam_tpu.slam import gaussian_map as gm


def make_map(C=64, n=10, key=0):
    m = gm.create(C, max_sh_degree=0)
    k = jax.random.PRNGKey(key)
    new = gm.GaussianParams(
        xyz=jax.random.normal(k, (n, 3)),
        f_dc=jnp.ones((n, 1, 3)) * 0.3,
        f_rest=jnp.zeros((n, 0, 3)),
        opacity=jnp.full((n, 1), gm.inverse_sigmoid(0.5)),
        scaling=jnp.full((n, 3), -3.0),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
    )
    m, dropped = gm.extend(m, new, jnp.ones(n, bool), kf_id=0)
    return m, new, dropped


def test_extend_and_capacity():
    m, new, dropped = make_map()
    assert int(dropped) == 0
    assert int(gm.num_alive(m)) == 10
    # wrote the right data into alive slots
    alive_xyz = np.asarray(m.params.xyz)[np.asarray(m.aux.alive)]
    np.testing.assert_allclose(np.sort(alive_xyz, 0),
                               np.sort(np.asarray(new.xyz), 0), atol=1e-6)
    # overflow: extend beyond capacity
    m2, _, _ = make_map(C=16, n=10)
    big = gm.GaussianParams(*[jnp.ones((10,) + a.shape[1:]) for a in m2.params])
    m3, dropped = gm.extend(m2, big, jnp.ones(10, bool), kf_id=1)
    assert int(gm.num_alive(m3)) == 16
    assert int(dropped) == 4


def test_adam_step_moves_alive_only():
    m, _, _ = make_map()
    grads = gm.GaussianParams(*[jnp.ones_like(a) for a in m.params])
    lrs = gm.LearningRates(*[jnp.float32(0.1)] * 6)
    m2 = gm.adam_step(m, grads, lrs)
    moved = np.abs(np.asarray(m2.params.xyz - m.params.xyz)).sum(-1)
    alive = np.asarray(m.aux.alive)
    assert np.all(moved[alive] > 0)
    assert np.all(moved[~alive] == 0)
    assert int(m2.adam.count) == 1


def test_densify_clone_and_split():
    m, _, _ = make_map(C=64, n=8)
    # mark high gradient stats on all alive
    alive = m.aux.alive
    m = m._replace(aux=m.aux._replace(
        xyz_grad_accum=jnp.where(alive, 10.0, 0.0),
        denom=jnp.where(alive, 1.0, 0.0)))
    # small scales -> clone path (scaling exp(-3) ~ 0.05 <= 0.01*extent needs
    # extent >= 5); big extent => clones
    m2, dropped = gm.densify_and_prune(
        m, jax.random.PRNGKey(1), max_grad=1.0, min_opacity=0.005,
        extent=100.0, max_screen_size=None)
    assert int(dropped) == 0
    assert int(gm.num_alive(m2)) == 16  # 8 originals + 8 clones
    # small extent => split: originals pruned, 2 children each
    m3, dropped = gm.densify_and_prune(
        m, jax.random.PRNGKey(2), max_grad=1.0, min_opacity=0.005,
        extent=0.01, max_screen_size=None)
    assert int(gm.num_alive(m3)) == 16  # 8 removed + 16 children
    # children have shrunken scale
    ch = np.asarray(m3.params.scaling)[np.asarray(m3.aux.alive)]
    np.testing.assert_allclose(ch, -3.0 - np.log(1.6), atol=1e-5)
    # stats were reset
    assert float(m3.aux.xyz_grad_accum.sum()) == 0.0


def test_prune_by_opacity():
    m, _, _ = make_map()
    # set half the alive slots transparent
    alive_idx = np.where(np.asarray(m.aux.alive))[0]
    op = m.params.opacity.at[alive_idx[:5]].set(gm.inverse_sigmoid(0.001))
    m = m._replace(params=m.params._replace(opacity=op))
    m2, _ = gm.densify_and_prune(
        m, jax.random.PRNGKey(0), max_grad=1e9, min_opacity=0.005,
        extent=1.0, max_screen_size=None)
    assert int(gm.num_alive(m2)) == 5


def test_reset_opacity_nonvisible():
    m, _, _ = make_map()
    visible = jnp.zeros(64, bool).at[0].set(True)
    m2 = gm.reset_opacity_nonvisible(m, visible)
    op = np.asarray(gm.get_opacity(m2.params))
    alive = np.asarray(m.aux.alive)
    assert np.allclose(op[alive & ~np.asarray(visible)], 0.4, atol=1e-5)
    # adam state for opacity zeroed
    assert float(jnp.abs(m2.adam.mu.opacity).sum()) == 0.0


def test_ply_roundtrip(tmp_path):
    m, _, _ = make_map()
    path = os.path.join(tmp_path, "test.ply")
    n = gm.save_ply(m, path)
    assert n == 10
    data = gm.load_ply(path)
    alive = np.asarray(m.aux.alive)
    np.testing.assert_allclose(
        np.sort(data["xyz"], 0),
        np.sort(np.asarray(m.params.xyz)[alive], 0), atol=1e-6)


def test_stats_accumulation():
    m, _, _ = make_map()
    g2d = jnp.ones((64, 2)) * 3.0
    radii = jnp.where(m.aux.alive, 5, 0)
    m2 = gm.add_densification_stats(m, g2d, radii)
    alive = np.asarray(m.aux.alive)
    assert np.allclose(np.asarray(m2.aux.xyz_grad_accum)[alive],
                       np.sqrt(18.0), atol=1e-5)
    assert np.all(np.asarray(m2.aux.denom)[alive] == 1.0)
    assert np.all(np.asarray(m2.aux.max_radii2d)[alive] == 5.0)
