"""Gaussian/tile-sharded differentiable rasterizer (SURVEY §7 stage 4).

Phase layout over a device mesh axis `g` (D devices):

  1. PROJECT + BIN, sharded by GAUSSIANS: each device projects its N/D
     Gaussian slice and bins it into per-tile, depth-sorted candidate lists
     of local capacity K/D (binning.bin_gaussians — per-shard global argsort,
     purely local work).
  2. ALL_TO_ALL, gaussians -> tiles: each device sends its candidate tables
     for tile-block t to the device that owns tiles t. One collective over
     ICI; payload is the packed (tiles, K/D, 16) attribute tables.
  3. MERGE + COMPOSITE, sharded by TILES: each device merge-sorts the D
     incoming depth-sorted lists per owned tile (one argsort over K keys)
     and runs the fused Pallas compositing kernel on its tile block.
  4. ALL_GATHER the composited tiles (color/depth/alpha) back to every
     device for the (replicated) loss.

The backward pass runs the same route in reverse automatically: shard_map
transposes all_gather -> psum_scatter and all_to_all -> all_to_all, the
Pallas kernel has its analytic VJP, and the per-tile gathers transpose to
scatter-adds into each device's Gaussian shard.

Semantics match ops/rasterizer.render_pallas exactly when no per-shard tile
list overflows (asserted by tests/test_multichip.py): merging D depth-sorted
sublists by key equals the global depth sort restricted to the tile.

No reference counterpart (single GPU); this is the build's new capability
(BASELINE.md config 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .compat import shard_map

from ..ops.rasterizer import binning
from ..ops.rasterizer import pallas_composite as pc
from ..ops.rasterizer.binning import bin_gaussians
from ..ops.rasterizer.composite import RenderOutput, untile
from ..ops.rasterizer.projection import project_gaussians


def make_sharded_render(mesh: Mesh, image_size, *, capacity_local: int = 128,
                        chunk: int = 64, sh_degree: int = 0,
                        interpret: bool | None = None, axis: str = "g",
                        cull_size: tuple[int, int] | None = None):
    """Build fn(means3d, scales, rotations, opacities, sh, w2c, intrinsics,
    pose_delta, alive, bg) -> (color, depth, alpha, overflow), differentiable
    w.r.t. all Gaussian params and pose_delta.

    Gaussian count N must be divisible by D; tile count must be divisible by
    D (pad the image to multiples of 16*D in one dimension if needed)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    D = mesh.devices.size
    th, tw = binning.num_tiles(image_size)
    T = th * tw
    assert T % D == 0, f"tile count {T} not divisible by {D} devices"
    T_loc = T // D
    K = D * capacity_local
    assert K % chunk == 0, f"merged capacity {K} not divisible by chunk"

    def body(means3d, scales, rotations, opacities, sh_coeffs, w2c,
             intrinsics, pose_delta, mean2d_offset, alive, bg):
        # ---- phase 1: project + bin the LOCAL Gaussian shard ----
        # projection culls/clamps against cull_size (the TRUE image): when
        # image_size is mesh-padded (T % D), the padding must not change the
        # frustum cull or the EWA tanfov clamp vs the single-device path
        proj = project_gaussians(
            means3d, scales, rotations, opacities, sh_coeffs, w2c,
            intrinsics, cull_size or image_size, sh_degree=sh_degree,
            pose_delta=pose_delta)
        valid = proj.valid & alive
        mean2d = proj.mean2d + mean2d_offset  # zero input; grad drives
        #                                       densification stats
        bins = bin_gaussians(
            jax.lax.stop_gradient(mean2d), proj.radius,
            jax.lax.stop_gradient(proj.depth), valid, image_size,
            capacity=capacity_local)

        attrs = jnp.concatenate(
            [mean2d, proj.conic, proj.color, proj.opacity[:, None],
             proj.depth[:, None],
             jnp.zeros((means3d.shape[0], pc.ATTR_F - 10),
                       mean2d.dtype)], axis=1)
        safe_ids = jnp.maximum(bins.ids, 0)
        table = attrs[safe_ids]                      # (T, Kloc, F)
        slot = jnp.arange(capacity_local)[None, :]
        live = slot < bins.counts[:, None]           # (T, Kloc)
        keys = jnp.where(live, jax.lax.stop_gradient(table[..., pc._A_D]),
                         jnp.inf)

        # ---- phase 2: all_to_all gaussians -> tiles ----
        tbl = table.reshape(D, T_loc, capacity_local, pc.ATTR_F)
        tbl = jax.lax.all_to_all(tbl, axis, 0, 0, tiled=False)
        kys = keys.reshape(D, T_loc, capacity_local)
        kys = jax.lax.all_to_all(kys, axis, 0, 0, tiled=False)
        cnt = bins.counts.reshape(D, T_loc)
        cnt = jax.lax.all_to_all(cnt, axis, 0, 0, tiled=False)

        # ---- phase 3: per-tile merge of D depth-sorted sublists ----
        tbl = jnp.moveaxis(tbl, 0, 1).reshape(T_loc, K, pc.ATTR_F)
        kys = jnp.moveaxis(kys, 0, 1).reshape(T_loc, K)
        order = jnp.argsort(kys, axis=1)             # stable
        merged = jnp.take_along_axis(tbl, order[..., None], axis=1)
        counts = jnp.sum(cnt, axis=0).astype(jnp.int32)   # (T_loc,)

        tile_ids = (jax.lax.axis_index(axis) * T_loc
                    + jnp.arange(T_loc, dtype=jnp.int32))
        tiles = pc.composite_tiles_pallas(tw, chunk, interpret,
                                          counts, merged, bg,
                                          tile_ids=tile_ids)

        # ---- phase 4: gather tiles for the replicated loss ----
        color = jax.lax.all_gather(tiles.color, axis, axis=0, tiled=True)
        depth = jax.lax.all_gather(tiles.depth, axis, axis=0, tiled=True)
        alpha = jax.lax.all_gather(tiles.alpha, axis, axis=0, tiled=True)
        overflow = jax.lax.psum(bins.overflow, axis)
        radii = jnp.where(valid, proj.radius, 0)  # stays gaussian-sharded
        return color, depth, alpha, overflow, radii

    gspec = P(axis)
    repl = P()
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, gspec, repl, repl, repl,
                  gspec, gspec, repl),
        out_specs=(repl, repl, repl, repl, gspec))

    def render_fn(means3d, scales, rotations, opacities, sh_coeffs, w2c,
                  intrinsics, pose_delta=None, mean2d_offset=None, alive=None,
                  bg=None):
        N = means3d.shape[0]
        assert N % D == 0, f"{N} gaussians not divisible by {D} devices"
        if pose_delta is None:
            pose_delta = jnp.zeros(6, means3d.dtype)
        if mean2d_offset is None:
            mean2d_offset = jnp.zeros((N, 2), means3d.dtype)
        if alive is None:
            alive = jnp.ones(N, bool)
        if bg is None:
            bg = jnp.zeros(3, means3d.dtype)
        color, depth, alpha, overflow, radii = sharded(
            means3d, scales, rotations, opacities, sh_coeffs, w2c,
            intrinsics, pose_delta, mean2d_offset, alive, bg)
        return RenderOutput(
            color=untile(color, image_size),
            depth=untile(depth, image_size),
            alpha=untile(alpha, image_size),
            n_touched=jnp.zeros(N, jnp.int32),
            radii=radii,
            overflow=overflow)

    return render_fn
