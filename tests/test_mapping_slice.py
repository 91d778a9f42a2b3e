"""Minimum end-to-end mapping slice (north-star config 2 in miniature).

Build a synthetic 'ground-truth' scene of Gaussians, render target images
from 3 cameras, then seed a fresh map from noisy depth and optimize it with
the full train step (render -> loss -> grads -> adam [+ densify]) and check
the reconstruction PSNR improves substantially. This is the reference's
map_opt_online loop (mapper.py:1049-1232) reduced to its core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildgs_slam_tpu.ops import lie
from wildgs_slam_tpu.ops.rasterizer import render
from wildgs_slam_tpu.slam import gaussian_map as gm
from wildgs_slam_tpu.slam import losses
from wildgs_slam_tpu.slam.pcd import seed_gaussians_from_depth

H, W = 48, 64
INTR = jnp.array([55.0, 55.0, W / 2, H / 2])


def gt_scene():
    key = jax.random.PRNGKey(7)
    N = 120
    k1, k2, k3 = jax.random.split(key, 3)
    means = jnp.concatenate(
        [jax.random.uniform(k1, (N, 2)) * 2.4 - 1.2,
         2.0 + jax.random.uniform(k2, (N, 1)) * 1.5], -1)
    scales = 0.08 + 0.12 * jax.random.uniform(k3, (N, 3))
    rots = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (N, 1))
    opac = jnp.full((N,), 0.95)
    sh = jax.random.uniform(jax.random.PRNGKey(8), (N, 1, 3)) * 1.2
    return means, scales, rots, opac, sh


def cameras():
    views = []
    for i, xi in enumerate([
        jnp.zeros(6),
        jnp.array([0.1, 0.02, 0.0, 0.0, 0.05, 0.0]),
        jnp.array([-0.1, -0.02, 0.0, 0.0, -0.05, 0.0]),
    ]):
        views.append(lie.se3_exp(xi))
    return views


@pytest.mark.slow
def test_mapping_optimization_improves_psnr():
    means, scales, rots, opac, sh = gt_scene()
    views = cameras()
    targets = [
        render(means, scales, rots, opac, sh, v, INTR, (H, W),
               capacity=256, chunk=32)
        for v in views
    ]

    # seed a map from the GT depth of view 0 (normalized depth = depth/alpha)
    t0 = targets[0]
    depth0 = jnp.where(t0.alpha > 0.5, t0.depth / jnp.clip(t0.alpha, 1e-6), 0.0)
    m = gm.create(512, max_sh_degree=0)
    params, valid = seed_gaussians_from_depth(
        jax.random.PRNGKey(0), t0.color, depth0, views[0], INTR,
        downsample_factor=8, point_size=0.05, num_sh_rest=0, isotropic=False)
    m, dropped = gm.extend(m, params, valid, kf_id=0)
    assert int(dropped) == 0
    assert int(gm.num_alive(m)) > 100

    lrs = gm.LearningRates(
        xyz=jnp.float32(0.003), f_dc=jnp.float32(0.02),
        f_rest=jnp.float32(0.001), opacity=jnp.float32(0.05),
        scaling=jnp.float32(0.01), rotation=jnp.float32(0.001))

    def loss_fn(p, aux, view, target):
        out = render(
            p.xyz, gm.get_scaling(p), gm.get_rotation_xyzw(p),
            gm.get_opacity(p), gm.get_sh(p), view, INTR, (H, W),
            alive=aux.alive, capacity=256, chunk=32)
        gt_depth = jnp.where(target.alpha > 0.5,
                             target.depth / jnp.clip(target.alpha, 1e-6), 0.0)
        l = losses.mapping_loss_rgbd(
            out.color, out.depth, target.color, gt_depth,
            jnp.float32(0), jnp.float32(0), cfg_alpha=0.95,
            rgb_boundary_threshold=0.01, use_ssim=False, lambda_dssim=0.2,
            initialization=True)
        l = l + 10.0 * losses.isotropic_loss(p.scaling, aux.alive)
        return l, out

    @jax.jit
    def train_step(m, view, target):
        (l, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            m.params, m.aux, view, target)
        m = gm.add_densification_stats(
            m, jnp.zeros((m.params.xyz.shape[0], 2)), out.radii)
        m = gm.adam_step(m, grads, lrs)
        return m, l

    def psnr(m):
        errs = []
        for v, t in zip(views, targets):
            out = render(m.params.xyz, gm.get_scaling(m.params),
                         gm.get_rotation_xyzw(m.params),
                         gm.get_opacity(m.params), gm.get_sh(m.params),
                         v, INTR, (H, W), alive=m.aux.alive,
                         capacity=256, chunk=32)
            errs.append(float(jnp.mean((out.color - t.color) ** 2)))
        mse = np.mean(errs)
        return -10 * np.log10(mse + 1e-12)

    psnr0 = psnr(m)
    for it in range(150):
        view_id = it % 3
        m, l = train_step(m, views[view_id], targets[view_id])
    psnr1 = psnr(m)
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 3.0, f"PSNR {psnr0:.2f} -> {psnr1:.2f}"
    assert psnr1 > 15.0, f"final PSNR too low: {psnr1:.2f}"
