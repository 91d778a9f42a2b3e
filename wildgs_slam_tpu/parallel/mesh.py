"""Device mesh + sharded mapping step.

The reference is strictly single-GPU (SURVEY.md §2.4); multi-chip scale-out
is this build's new capability. First axis of parallelism: the mapping
optimization. The reference optimizes a 10-keyframe covisibility window by
sampling ONE view per iteration (mapper.py:1049-1232); here every device
renders a DIFFERENT view of the replicated Gaussian map each step and
gradients are summed over the mesh — a V-fold increase in rays/step with one
all-reduce (riding ICI), mathematically a larger batch of the same
estimator.

Gaussian-axis sharding for projection/binning (the tiles x gaussians
all_to_all design of SURVEY §7 stage 4) layers on top later.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rasterizer import render
from ..slam import gaussian_map as gm
from ..slam import losses


def make_mesh(n_devices: int | None = None, axis: str = "view") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def multiview_loss(params, aux, views_w2c, gt_colors, gt_depths, intrinsics,
                   image_size, capacity, chunk):
    """Mean mapping loss over a batch of views (leading axis = view)."""

    def one_view(w2c, gt_c, gt_d):
        out = render(
            params.xyz, gm.get_scaling(params), gm.get_rotation_xyzw(params),
            gm.get_opacity(params), gm.get_sh(params), w2c, intrinsics,
            image_size, alive=aux.alive, capacity=capacity, chunk=chunk)
        return losses.mapping_loss_rgbd(
            out.color, out.depth, gt_c, gt_d, jnp.float32(0), jnp.float32(0),
            cfg_alpha=0.95, rgb_boundary_threshold=0.01, use_ssim=False,
            lambda_dssim=0.2, initialization=True)

    per_view = jax.vmap(one_view)(views_w2c, gt_colors, gt_depths)
    return per_view.mean() + 10.0 * losses.isotropic_loss(
        params.scaling, aux.alive)


def pad_image_size_for_mesh(image_size, n_devices: int):
    """Smallest (H', W') >= image_size whose 16px-tile count divides
    n_devices (the sharded rasterizer's T % D constraint,
    sharded_raster.py:60). Pads rows of tiles (H) first. Render at the
    padded size, then crop the outputs back to image_size — padded tiles
    composite pure background and cost ~nothing."""
    from ..ops.rasterizer import binning

    H, W = image_size
    th, tw = binning.num_tiles((H, W))
    while (th * tw) % n_devices:
        th += 1
    return th * binning.TILE, tw * binning.TILE


def pad_gaussian_capacity(n: int, n_devices: int) -> int:
    """Smallest capacity >= n divisible by n_devices (sharded rasterizer's
    N % D constraint; dead pad slots carry alive=False)."""
    return -(-n // n_devices) * n_devices


def shard_gaussian_map(gmap, mesh: Mesh, axis: str = "g"):
    """Commit a GaussianMap to the mesh with every capacity-leading leaf
    sharded by Gaussian slot (params + aux + both Adam moments); scalar
    leaves (adam.count) replicated. This is what makes map size scale with
    the mesh instead of one chip's HBM."""
    C = gmap.params.xyz.shape[0]
    assert C % mesh.devices.size == 0, (
        f"capacity {C} % {mesh.devices.size} != 0; use pad_gaussian_capacity")
    gspec = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == C:
            return jax.device_put(leaf, gspec)
        return jax.device_put(leaf, repl)

    return jax.tree.map(put, gmap)


def make_gsharded_render_fn(mesh: Mesh, image_size, capacity_local=128,
                            chunk=64, sh_degree: int = 0, axis: str = "g"):
    """Adapter: the gaussian/tile-sharded rasterizer in the
    (params, alive, w2c, intrinsics, mean2d_offset) -> RenderOutput shape
    that mapper._opt_segment's `render_fn` hook expects. Renders at a
    mesh-padded size and crops back, so any image size works on any D."""
    from ..ops.rasterizer.composite import RenderOutput
    from .sharded_raster import make_sharded_render

    D = mesh.devices.size
    padded = pad_image_size_for_mesh(image_size, D)
    rf = make_sharded_render(mesh, padded, capacity_local=capacity_local,
                             chunk=chunk, sh_degree=sh_degree, axis=axis,
                             cull_size=image_size)
    H, W = image_size

    def render_fn(params, alive, w2c, intrinsics, mean2d_offset=None):
        out = rf(params.xyz, gm.get_scaling(params),
                 gm.get_rotation_xyzw(params), gm.get_opacity(params),
                 gm.get_sh(params), w2c, intrinsics,
                 mean2d_offset=mean2d_offset, alive=alive)
        return RenderOutput(
            color=out.color[:H, :W], depth=out.depth[:H, :W],
            alpha=out.alpha[:H, :W], n_touched=out.n_touched,
            radii=out.radii, overflow=out.overflow)

    return render_fn


def make_sharded_train_step(mesh: Mesh, intrinsics, image_size, lrs,
                            capacity=256, chunk=64, axis: str = "view"):
    """jit a full mapping train step: per-device view rendering, summed
    grads (XLA inserts the psum over ICI), replicated Adam update."""

    view_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(repl, view_sharding, view_sharding, view_sharding),
             out_shardings=(repl, repl),
             static_argnums=())
    def train_step(gmap, views_w2c, gt_colors, gt_depths):
        loss, grads = jax.value_and_grad(
            lambda p: multiview_loss(p, gmap.aux, views_w2c, gt_colors,
                                     gt_depths, intrinsics, image_size,
                                     capacity, chunk))(gmap.params)
        gmap = gm.adam_step(gmap, grads, lrs)
        return gmap, loss

    return train_step
