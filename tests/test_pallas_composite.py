"""Pallas fused composite kernel vs the per-pixel oracle (interpret mode on
CPU). Checks forward outputs bit-close and the hand-derived backward against
autodiff of the reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgs_slam_tpu.ops import lie
from wildgs_slam_tpu.ops.rasterizer import render_pallas, render_reference


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(0)
    N, H, W = 200, 48, 64
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate([jax.random.uniform(k1, (N, 2)) * 2 - 1,
                             2.0 + jax.random.uniform(k2, (N, 1)) * 2], -1)
    scales = 0.02 + 0.08 * jax.random.uniform(k3, (N, 3))
    rots = jax.random.normal(k4, (N, 4))
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = 0.3 + 0.6 * jax.random.uniform(k5, (N,))
    sh = jax.random.uniform(jax.random.PRNGKey(9), (N, 1, 3))
    return dict(means=means, scales=scales, rots=rots, opac=opac, sh=sh,
                w2c=lie.se3_identity(),
                intr=jnp.array([55.0, 55.0, W / 2, H / 2]), H=H, W=W)


def test_forward_matches_oracle(scene):
    s = scene
    out_p = render_pallas(s["means"], s["scales"], s["rots"], s["opac"],
                          s["sh"], s["w2c"], s["intr"], (s["H"], s["W"]),
                          capacity=256, chunk=64)
    out_r = render_reference(s["means"], s["scales"], s["rots"], s["opac"],
                             s["sh"], s["w2c"], s["intr"], (s["H"], s["W"]))
    np.testing.assert_allclose(out_p.color, out_r.color, atol=1e-5)
    np.testing.assert_allclose(out_p.depth, out_r.depth, atol=1e-4)
    np.testing.assert_allclose(out_p.alpha, out_r.alpha, atol=1e-5)


def test_backward_matches_oracle(scene):
    s = scene
    H, W = s["H"], s["W"]

    def loss(renderer, m, sc, o, pd):
        out = renderer(m, sc, s["rots"], o, s["sh"], s["w2c"], s["intr"],
                       (H, W), pose_delta=pd)
        return (jnp.sum(out.color ** 2) + 0.01 * jnp.sum(out.depth ** 2)
                + 0.1 * jnp.sum(out.alpha ** 2))

    args = (s["means"], s["scales"], s["opac"], jnp.zeros(6))
    gp = jax.grad(lambda *a: loss(
        lambda *r, **k: render_pallas(*r, capacity=256, chunk=64, **k), *a),
        argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(lambda *a: loss(render_reference, *a),
                  argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gp, gr):
        d = float(jnp.abs(a - b).max())
        m = float(jnp.abs(b).max())
        assert d / (m + 1e-12) < 1e-5, f"grad mismatch rel {d/(m+1e-12)}"


def test_background_gradient(scene):
    """bg enters through T_final — check its gradient too."""
    s = scene

    def loss(bg):
        out = render_pallas(s["means"], s["scales"], s["rots"], s["opac"],
                            s["sh"], s["w2c"], s["intr"], (s["H"], s["W"]),
                            bg=bg, capacity=256, chunk=64)
        return jnp.sum(out.color ** 2)

    def loss_ref(bg):
        out = render_reference(s["means"], s["scales"], s["rots"], s["opac"],
                               s["sh"], s["w2c"], s["intr"],
                               (s["H"], s["W"]), bg=bg)
        return jnp.sum(out.color ** 2)

    bg = jnp.array([0.1, 0.5, 0.9])
    g1 = jax.grad(loss)(bg)
    g2 = jax.grad(loss_ref)(bg)
    np.testing.assert_allclose(g1, g2, rtol=1e-4)


def test_sort_binning_rev_vjp_matches(scene):
    """bin_method='sort' routes the attrs-table backward through the
    reverse-index GATHER (_gather_rows_rev) instead of XLA's scatter-add.
    Forward and every gradient must match the onehot path, including under
    per-tile capacity truncation (capacity=24 overflows on this scene)."""
    s = scene
    H, W = s["H"], s["W"]

    def loss(m, sc, o, pd, method, capacity):
        out = render_pallas(m, sc, s["rots"], o, s["sh"], s["w2c"],
                            s["intr"], (H, W), pose_delta=pd,
                            capacity=capacity, chunk=8, bin_method=method,
                            bin_kw=6)
        return (jnp.sum(out.color ** 2) + 0.01 * jnp.sum(out.depth ** 2)
                + 0.1 * jnp.sum(out.alpha ** 2))

    args = (s["means"], s["scales"], s["opac"], jnp.zeros(6))
    for capacity in (256, 24):
        va, ga = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            *args, "onehot", capacity)
        vb, gb = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            *args, "sort", capacity)
        np.testing.assert_allclose(va, vb, rtol=1e-6)
        for a, b in zip(ga, gb):
            d = float(jnp.abs(a - b).max())
            m = float(jnp.abs(a).max())
            assert d / (m + 1e-12) < 1e-5, (
                f"cap={capacity} grad mismatch rel {d / (m + 1e-12)}")
