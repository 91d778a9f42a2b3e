"""Tile binning: depth sort + per-tile fixed-capacity index lists (pure JAX).

TPU-native replacement for the CUDA rasterizer's duplicate-keys +
radix-sort-by-(tile|depth) stage. On TPU we keep everything static-shape:

  1. one global argsort by camera depth (invalid Gaussians pushed to +inf),
  2. a (num_tiles, N) tile-intersection mask from screen bounding boxes,
  3. an order-preserving masked compaction (cumsum + scatter) into a dense
     (num_tiles, CAPACITY) table of Gaussian indices, front-to-back.

The compaction replaces the variable-length per-tile lists of the CUDA design
with fixed capacity; overflow beyond CAPACITY is dropped (reported via
`overflow` so callers can log / re-run with a bigger budget).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # tile side in pixels; 16x16 = 256 px = 2 TPU lanes rows


class TileBins(NamedTuple):
    ids: jax.Array        # (num_tiles, capacity) int32 Gaussian ids, -1 pad
    counts: jax.Array     # (num_tiles,) int32 number of live entries
    overflow: jax.Array   # () int32 total dropped entries


def num_tiles(image_size: tuple[int, int]) -> tuple[int, int]:
    H, W = image_size
    return -(-H // TILE), -(-W // TILE)


def bin_gaussians(
    mean2d: jax.Array,
    radius: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    image_size: tuple[int, int],
    capacity: int = 1024,
    method: str = "onehot",
) -> TileBins:
    """Build per-tile depth-ordered Gaussian id lists.

    Args: see ProjectedGaussians; all (N,)-leading.
    method: 'onehot' = cumsum + chunked one-hot matmul scatter (MXU);
            'topk'   = lax.top_k over rank keys (no (T,N,cap) intermediate).
    """
    H, W = image_size
    th, tw = num_tiles(image_size)
    n_tiles = th * tw
    N = mean2d.shape[0]

    # 1. global front-to-back order
    sort_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_key)  # (N,)
    smean = mean2d[order]
    srad = radius[order].astype(jnp.float32)
    svalid = valid[order]

    # 2. tile intersection mask (tiles, N) from bounding boxes
    #    gaussian bbox in tile units
    x0 = jnp.floor((smean[:, 0] - srad) / TILE)
    x1 = jnp.floor((smean[:, 0] + srad) / TILE)
    y0 = jnp.floor((smean[:, 1] - srad) / TILE)
    y1 = jnp.floor((smean[:, 1] + srad) / TILE)

    if method == "sort":
        # CUDA-style duplicate + sort (the radix-sort design of the
        # reference rasterizer, mapped to one XLA sort): each gaussian emits
        # up to KW*KW (tile, depth-rank) keys over its bbox window; a global
        # sort groups them by tile in depth order; per-tile runs are then
        # read back with plain gathers. Work is O(N·K log(N·K) + T·cap)
        # instead of the dense methods' O(T·N·cap) compare volume — the
        # winner at mapping scale (N ~ 1e5).
        assert (n_tiles + 1) * N < 2 ** 31, "sort keys exceed int32"
        KW = 4  # bbox window side in tiles; larger gaussians are truncated
        #         (counted in overflow) — at 16px tiles this covers r<=24..56
        dy, dx = jnp.meshgrid(jnp.arange(KW), jnp.arange(KW), indexing="ij")
        dy = dy.reshape(-1)[None, :]
        dx = dx.reshape(-1)[None, :]
        ty = y0.astype(jnp.int32)[:, None] + dy       # (N, K)
        tx = x0.astype(jnp.int32)[:, None] + dx
        in_bbox = ((tx <= x1.astype(jnp.int32)[:, None])
                   & (ty <= y1.astype(jnp.int32)[:, None]))
        in_img = (tx >= 0) & (tx < tw) & (ty >= 0) & (ty < th)
        ventry = svalid[:, None] & in_bbox & in_img
        tile = ty * tw + tx
        rank = jnp.arange(N, dtype=jnp.int32)[:, None]
        BIG = jnp.int32(2 ** 31 - 1)
        key = jnp.where(ventry, tile * N + rank, BIG)  # needs T*N < 2^31
        sk = jnp.sort(key.reshape(-1))

        bounds = jnp.searchsorted(sk, jnp.arange(n_tiles + 1,
                                                 dtype=jnp.int32) * N)
        starts, ends = bounds[:-1], bounds[1:]
        counts_raw = ends - starts
        counts = jnp.minimum(counts_raw, capacity)

        slot = jnp.arange(capacity, dtype=jnp.int32)[None, :]
        gidx = jnp.clip(starts[:, None] + slot, 0, N * KW * KW - 1)
        val = sk[gidx]
        live = (starts[:, None] + slot < ends[:, None]) & (val < BIG)
        ids = jnp.where(live, order[jnp.clip(val % N, 0, N - 1)], -1)

        # overflow: per-tile capacity truncation + bbox-window truncation
        bw = (x1 - x0 + 1).astype(jnp.int32)
        bh = (y1 - y0 + 1).astype(jnp.int32)
        n_true = jnp.where(svalid, bw * bh, 0)
        n_win = jnp.where(svalid, jnp.minimum(bw, KW) * jnp.minimum(bh, KW),
                          0)
        overflow = (jnp.sum(jnp.maximum(counts_raw - capacity, 0))
                    + jnp.sum(n_true - n_win))
        return TileBins(ids=ids.astype(jnp.int32),
                        counts=counts.astype(jnp.int32), overflow=overflow)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    ty = (tile_ids // tw).astype(jnp.float32)  # (T,)
    tx = (tile_ids % tw).astype(jnp.float32)

    mask = (
        svalid[None, :]
        & (x0[None, :] <= tx[:, None])
        & (x1[None, :] >= tx[:, None])
        & (y0[None, :] <= ty[:, None])
        & (y1[None, :] >= ty[:, None])
    )  # (T, N)

    if method == "topk":
        # 3'. first-`capacity` set bits per tile via top_k on rank keys:
        # key[t, n] = -n if intersecting else -inf; the k largest keys are
        # the k SMALLEST sorted-order ranks, returned in order. Avoids the
        # (T, CHUNK, capacity) one-hot intermediates entirely.
        key = jnp.where(mask, -jnp.arange(N, dtype=jnp.float32),
                        -jnp.inf)
        vals, pos = jax.lax.top_k(key, capacity)         # (T, cap)
        found = vals > -jnp.inf
        ids = jnp.where(found, order[pos], -1)
        counts_raw = jnp.sum(mask, axis=1)
        counts = jnp.minimum(counts_raw, capacity)
        overflow = jnp.sum(jnp.maximum(counts_raw - capacity, 0))
        return TileBins(ids=ids.astype(jnp.int32),
                        counts=counts.astype(jnp.int32), overflow=overflow)

    # 3. order-preserving compaction into fixed-capacity lists. The prefix
    # sum runs as a blocked triangular matmul and the "write id to its rank"
    # scatter as a chunked one-hot matmul — both MXU work; XLA's scatter
    # lowering on TPU is serial and dominated the whole rasterizer.
    from ..scanops import cumsum_mxu

    pos = cumsum_mxu(mask.astype(jnp.float32), axis=1).astype(jnp.int32) - 1
    counts = jnp.minimum(pos[:, -1] + 1, capacity)
    overflow = jnp.sum(jnp.maximum(pos[:, -1] + 1 - capacity, 0))

    write_pos = jnp.where(mask & (pos < capacity), pos, capacity)  # cap = trash
    src_vals = order.astype(jnp.float32) + 1.0  # +1 so empty slots -> 0 -> -1

    # ids[t, s] = sum_n onehot(write_pos[t, n] == s) * (order[n] + 1)
    CHUNK = 512
    nb = -(-N // CHUNK)
    padN = nb * CHUNK - N
    wp = jnp.pad(write_pos, ((0, 0), (0, padN)), constant_values=capacity)
    sv = jnp.pad(src_vals, (0, padN))
    slots = jnp.arange(capacity, dtype=jnp.int32)

    def body(acc, c):
        wp_c = jax.lax.dynamic_slice_in_dim(wp, c * CHUNK, CHUNK, axis=1)
        sv_c = jax.lax.dynamic_slice_in_dim(sv, c * CHUNK, CHUNK, axis=0)
        onehot = (wp_c[:, :, None] == slots[None, None, :]).astype(
            jnp.float32)  # (T, CHUNK, capacity)
        acc = acc + jnp.einsum("tnc,n->tc", onehot, sv_c,
                               preferred_element_type=jnp.float32)
        return acc, None

    ids_f, _ = jax.lax.scan(body, jnp.zeros((n_tiles, capacity)),
                            jnp.arange(nb))
    ids = ids_f.astype(jnp.int32) - 1  # empty slots -> -1

    return TileBins(ids=ids, counts=counts, overflow=overflow)
