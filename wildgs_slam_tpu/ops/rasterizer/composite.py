"""Front-to-back alpha compositing over image tiles (pure JAX, differentiable).

TPU-native re-design of renderCUDA in diff-gaussian-rasterization-w-pose:
instead of one CUDA block per tile with shared-memory batches, we process ALL
tiles simultaneously as a (num_tiles, TILE*TILE) pixel array and scan the
per-tile Gaussian lists in fixed-size chunks. XLA vectorizes the per-chunk
math onto the VPU; transmittance recursion is a cumulative product along the
chunk axis + a scalar carry between chunks.

Blending semantics match the CUDA kernel exactly (skip thresholds 1/255 and
power > 0, 0.99 alpha clamp, 1e-4 early-termination transmittance, background
blended with the last *committed* transmittance). The per-Gaussian `n_touched`
counter (used by the mapper's covisibility window, mapper.py:648-706) counts
contributing pixels, computed under stop_gradient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scanops import cumprod_pos_mxu
from .binning import TILE, TileBins, num_tiles

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4


class RenderOutput(NamedTuple):
    color: jax.Array      # (H, W, 3)
    depth: jax.Array      # (H, W) alpha-weighted depth (not normalized)
    alpha: jax.Array      # (H, W) accumulated opacity = 1 - T_final
    n_touched: jax.Array  # (N,) int32 contributing-pixel counts per Gaussian
    radii: jax.Array      # (N,) int32 screen radii (0 = culled)
    overflow: jax.Array   # () int32 dropped tile-list entries


def _tile_pixel_coords(image_size):
    th, tw = num_tiles(image_size)
    n_tiles = th * tw
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    ty, tx = tile_ids // tw, tile_ids % tw
    dy, dx = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    px = tx[:, None] * TILE + dx.reshape(-1)[None, :]
    py = ty[:, None] * TILE + dy.reshape(-1)[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32)  # (T, TILE*TILE)


def composite(
    bins: TileBins,
    mean2d: jax.Array,
    conic: jax.Array,
    color: jax.Array,
    opacity: jax.Array,
    depth: jax.Array,
    image_size: tuple[int, int],
    bg: jax.Array,
    chunk: int = 64,
    remat: bool = True,
):
    """Composite binned Gaussians into color/depth/alpha tile images.

    Returns (tiles_color (T, P, 3), tiles_depth (T, P), tiles_alpha (T, P),
    n_touched (N,)) with P = TILE*TILE pixels.
    """
    n_tiles, capacity = bins.ids.shape
    N = mean2d.shape[0]
    P = TILE * TILE

    px, py = _tile_pixel_coords(image_size)

    # Gather per-tile tables once: (T, K, C). Padding (-1) reads row 0 and is
    # masked by `live` below.
    safe_ids = jnp.maximum(bins.ids, 0)
    g_mean = mean2d[safe_ids]       # (T, K, 2)
    g_conic = conic[safe_ids]       # (T, K, 3)
    g_color = color[safe_ids]       # (T, K, 3)
    g_op = opacity[safe_ids]        # (T, K)
    g_depth = depth[safe_ids]       # (T, K)
    g_live = bins.ids >= 0          # (T, K)

    n_chunks = capacity // chunk
    assert n_chunks * chunk == capacity, "capacity must be a multiple of chunk"

    def body(carry, xs):
        T_run, T_comm, acc_rgb, acc_d, acc_a, touched = carry
        cm, cc, ccol, cop, cd, clive, cids = xs

        dx = cm[:, :, 0:1] - px[:, None, :]          # (T, ck, P)
        dy = cm[:, :, 1:2] - py[:, None, :]
        power = (
            -0.5 * (cc[:, :, 0:1] * dx * dx + cc[:, :, 2:3] * dy * dy)
            - cc[:, :, 1:2] * dx * dy
        )
        alpha = jnp.minimum(0.99, cop[:, :, None] * jnp.exp(power))
        alpha = jnp.where(
            (power > 0) | (alpha < _ALPHA_MIN) | ~clive[:, :, None], 0.0, alpha
        )

        # transmittance chain along the chunk axis (prefix product as a
        # triangular matmul in log space — MXU instead of a sequential scan)
        one_m = 1.0 - alpha                                   # (T, ck, P)
        t_incl = cumprod_pos_mxu(one_m, axis=1)               # T after each k
        t_before = T_run[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1
        )
        t_after = T_run[:, None, :] * t_incl
        contrib = t_after >= _T_EPS
        w = alpha * t_before * contrib                        # (T, ck, P)

        acc_rgb = acc_rgb + jnp.einsum("tkp,tkc->tpc", w, ccol)
        acc_d = acc_d + jnp.sum(w * cd[:, :, None], axis=1)
        acc_a = acc_a + jnp.sum(w, axis=1)

        # committed transmittance (for bg blend): last chain value >= eps
        cand = jnp.where(t_after >= _T_EPS, t_after, jnp.inf)
        T_comm = jnp.minimum(T_comm, jnp.min(cand, axis=1))

        # n_touched: pixels with positive contribution, per gaussian
        counts = jnp.sum((jax.lax.stop_gradient(w) > 0), axis=2)  # (T, ck)
        touched = touched.at[jax.lax.stop_gradient(cids)].add(
            counts.astype(jnp.int32), mode="drop"
        )

        T_run = t_after[:, -1, :]
        return (T_run, T_comm, acc_rgb, acc_d, acc_a, touched), None

    if remat:
        body = jax.checkpoint(body)

    def reshape_chunks(x):
        return x.reshape((n_tiles, n_chunks, chunk) + x.shape[2:]).swapaxes(0, 1)

    xs = tuple(
        reshape_chunks(a)
        for a in (g_mean, g_conic, g_color, g_op, g_depth, g_live,
                  jnp.where(bins.ids >= 0, bins.ids, N))
    )

    init = (
        jnp.ones((n_tiles, P)),
        jnp.full((n_tiles, P), jnp.inf),
        jnp.zeros((n_tiles, P, 3)),
        jnp.zeros((n_tiles, P)),
        jnp.zeros((n_tiles, P)),
        jnp.zeros((N + 1,), jnp.int32),  # slot N catches padding ids
    )
    (T_run, T_comm, acc_rgb, acc_d, acc_a, touched), _ = jax.lax.scan(
        body, init, xs
    )

    T_final = jnp.where(jnp.isinf(T_comm), T_run, T_comm)
    tiles_color = acc_rgb + T_final[..., None] * bg[None, None, :]
    return tiles_color, acc_d, acc_a, touched[:N], T_final


def untile(tiles: jax.Array, image_size) -> jax.Array:
    """(T, TILE*TILE, ...) tile pixels -> (H, W, ...) image (crop padding)."""
    H, W = image_size
    th, tw = num_tiles(image_size)
    chans = tiles.shape[2:]
    img = tiles.reshape((th, tw, TILE, TILE) + chans)
    img = jnp.moveaxis(img, 2, 1).reshape((th * TILE, tw * TILE) + chans)
    return img[:H, :W]
