"""Pallas fused tile-compositing kernel (forward + analytic backward).

The XLA composite (composite.py) is HBM-bound: every chunk step materializes
~15 (tiles, chunk, pixels) intermediates. This kernel keeps the whole
per-tile compositing chain in VMEM: one grid step = G tiles, each looping
over its Gaussian list in CK-sized chunks with an early exit when the tile's
count is exhausted or every pixel is saturated.

The backward pass is a second kernel processing chunks in reverse with the
standard 3DGS suffix-sum gradient identities (what diff-gaussian-
rasterization's renderCUDA backward hand-codes):

  out = Σ_k w_k c_k + T_fin·bg,  w_k = α_k·T_{k-1}·contrib_k
  dL/dα_k = T_{k-1}·g_k − (S_k + B)/(1−α_k),
    g_k = c_k·ḡ_c + d_k·ḡ_d + ḡ_a,  S_k = Σ_{j>k} w_j g_j,
    B = T_fin·(bg·ḡ_c + ḡ_T) on contributing k

Thresholds (1/255, power>0, 0.99 clamp, 1e-4 termination) are treated as
constants, exactly like the CUDA kernel. Forward outputs per-chunk entry
transmittances so the backward never re-runs the global prefix.

Performance design (round-2 trace-driven rewrite):
  * All per-gaussian attributes ride as ONE lane-packed (T, K, 16) block
    (layout _A* below). One HBM stream in, one packed gradient stream out —
    the round-1 design's five narrow (K,1..3) arrays cost 5 separate XLA
    gathers (~0.6 ms each) and 5 scatter-add VJPs; packed rows gather in
    0.03 ms.
  * Transmittance prefix products and the weighted suffix sums run as
    Hillis-Steele sublane-shift scans (log2(CK) shifted adds on the VPU) in
    exact fp32 — NOT as triangular matmuls: a (CK,CK)@(CK,P) matmul at
    HIGHEST precision costs 6 MXU passes and dominated the round-1 kernel
    (fwd 1.86 ms / bwd 5.8 ms measured; the scans make both sub-ms).
  * Per-channel color math uses (1, P) rows against a lane-transposed
    (3, P) cotangent so nothing ever needs an in-kernel transpose.

n_touched is NOT produced here (the mapping hot loop doesn't need it; the
covisibility render uses the XLA path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE

P = TILE * TILE          # pixels per tile
_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
_ONE_M_MIN = 0.01        # 1 - alpha >= 1 - 0.99

# packed attribute lanes: [mx, my, conic_a, conic_b, conic_c, r, g, b,
#                          opacity, depth] + 6 pad lanes
_A_MX, _A_MY, _A_CA, _A_CB, _A_CC = 0, 1, 2, 3, 4
_A_R, _A_G, _A_B, _A_OP, _A_D = 5, 6, 7, 8, 9
ATTR_F = 16


def _incl_scan(x, ck):
    """Inclusive prefix sum along the sublane (chunk) axis: log2(ck) shifted
    adds — exact fp32, no MXU."""
    s = x
    sh = 1
    while sh < ck:
        s = s + jnp.concatenate(
            [jnp.zeros((sh, s.shape[1]), s.dtype), s[:-sh, :]], axis=0)
        sh *= 2
    return s


def _incl_prod(x, ck):
    """Inclusive prefix PRODUCT along the sublane axis: log2(ck) shifted
    multiplies (ones shifted in). Exact sequential fp32 products — the same
    associativity class as the CUDA kernel's running T *= (1-alpha), and
    cheaper than the round-2 exp(cumsum(log)) form (two transcendental
    passes saved per chunk)."""
    s = x
    sh = 1
    while sh < ck:
        s = s * jnp.concatenate(
            [jnp.ones((sh, s.shape[1]), s.dtype), s[:-sh, :]], axis=0)
        sh *= 2
    return s


def _pixel_coords(t, tw):
    """Pixel (x, y) float coords of tile t as (1, P) rows."""
    ty = (t // tw).astype(jnp.float32)
    tx = (t % tw).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tx * TILE + (lin % TILE).astype(jnp.float32)
    py = ty * TILE + (lin // TILE).astype(jnp.float32)
    return px, py


def _chunk_geometry(blk, live, px, py):
    """Common alpha math: blk (CK, ATTR_F) packed attrs.

    Returns (alpha, raw, G, power, dx, dy, dead)."""
    dx = blk[:, _A_MX:_A_MX + 1] - px            # (CK, P)
    dy = blk[:, _A_MY:_A_MY + 1] - py
    power = (-0.5 * (blk[:, _A_CA:_A_CA + 1] * dx * dx
                     + blk[:, _A_CC:_A_CC + 1] * dy * dy)
             - blk[:, _A_CB:_A_CB + 1] * dx * dy)
    G = jnp.exp(power)
    raw = blk[:, _A_OP:_A_OP + 1] * G
    alpha = jnp.minimum(0.99, raw)
    dead = (power > 0) | (alpha < _ALPHA_MIN) | ~live
    alpha = jnp.where(dead, 0.0, alpha)
    return alpha, raw, G, power, dx, dy, dead


def _fwd_kernel(counts_ref, tile_ids_ref, attrs_ref, bg_ref, color_out,
                depth_out, alpha_out, tfin_out, tentry_out, acc_s,
                *, ck, n_chunks, tw, g_tiles):
    step = pl.program_id(0)
    for g in range(g_tiles):
        _fwd_one_tile(step * g_tiles + g, g, counts_ref, tile_ids_ref,
                      attrs_ref, bg_ref, color_out, depth_out, alpha_out,
                      tfin_out, tentry_out, acc_s, ck=ck, n_chunks=n_chunks,
                      tw=tw)


def _fwd_one_tile(t, g, counts_ref, tile_ids_ref, attrs_ref, bg_ref,
                  color_out, depth_out, alpha_out, tfin_out, tentry_out,
                  acc_s, *, ck, n_chunks, tw):
    count = counts_ref[t]
    # tile_ids maps the local table row to its GLOBAL tile id (identity on a
    # single device; rank-offset block under the tile-sharded renderer)
    px, py = _pixel_coords(tile_ids_ref[t], tw)

    # acc_s rows: 0-2 rgb, 3 depth, 4 alpha, 5 T (running), 6 Tc (committed)
    acc_s[0:5, :] = jnp.zeros((5, P))
    acc_s[5:6, :] = jnp.ones((1, P))
    acc_s[6:7, :] = jnp.full((1, P), jnp.inf)

    for c in range(n_chunks):  # static unroll; @pl.when does the early exit
        tentry_out[g, c, :] = acc_s[5, :]

        @pl.when((c * ck < count) & (jnp.max(acc_s[5:6, :]) >= _T_EPS))
        def _():
            sl = slice(c * ck, (c + 1) * ck)
            idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
            live = (c * ck + idx) < count                 # (CK, 1)
            blk = attrs_ref[g, sl, :]                     # (CK, ATTR_F)
            alpha, _, _, _, _, _, _ = _chunk_geometry(blk, live, px, py)
            one_m = jnp.maximum(1.0 - alpha, _ONE_M_MIN)
            t_incl = _incl_prod(one_m, ck)
            T = acc_s[5:6, :]
            t_after = T * t_incl                          # (CK, P)
            t_before = t_after / one_m
            contrib = (t_after >= _T_EPS).astype(jnp.float32)
            w = alpha * t_before * contrib                # (CK, P)

            acc_s[0:1, :] += jnp.sum(w * blk[:, _A_R:_A_R + 1], axis=0,
                                     keepdims=True)
            acc_s[1:2, :] += jnp.sum(w * blk[:, _A_G:_A_G + 1], axis=0,
                                     keepdims=True)
            acc_s[2:3, :] += jnp.sum(w * blk[:, _A_B:_A_B + 1], axis=0,
                                     keepdims=True)
            acc_s[3:4, :] += jnp.sum(w * blk[:, _A_D:_A_D + 1], axis=0,
                                     keepdims=True)
            acc_s[4:5, :] += jnp.sum(w, axis=0, keepdims=True)

            cand = jnp.where(t_after >= _T_EPS, t_after, jnp.inf)
            acc_s[6:7, :] = jnp.minimum(acc_s[6:7, :],
                                        jnp.min(cand, axis=0, keepdims=True))
            acc_s[5:6, :] = t_after[ck - 1:ck, :]

    Tfin = jnp.where(jnp.isinf(acc_s[6:7, :]), acc_s[5:6, :], acc_s[6:7, :])
    color_out[g] = acc_s[0:3, :] + Tfin * bg_ref[...]    # bg rides as (3, P)
    depth_out[g] = acc_s[3:4, :]
    alpha_out[g] = acc_s[4:5, :]
    tfin_out[g] = Tfin


def _bwd_kernel(counts_ref, tile_ids_ref, attrs_ref, bg_ref, tentry_ref,
                tfin_ref, gc_ref, gd_ref, ga_ref, gt_ref, dattrs_out, S_s,
                *, ck, n_chunks, tw, g_tiles):
    step = pl.program_id(0)
    for g in range(g_tiles):
        _bwd_one_tile(step * g_tiles + g, g, counts_ref, tile_ids_ref,
                      attrs_ref, bg_ref, tentry_ref, tfin_ref, gc_ref,
                      gd_ref, ga_ref, gt_ref, dattrs_out, S_s, ck=ck,
                      n_chunks=n_chunks, tw=tw)


def _bwd_one_tile(t, g, counts_ref, tile_ids_ref, attrs_ref, bg_ref,
                  tentry_ref, tfin_ref, gc_ref, gd_ref, ga_ref, gt_ref,
                  dattrs_out, S_s, *, ck, n_chunks, tw):
    count = counts_ref[t]
    px, py = _pixel_coords(tile_ids_ref[t], tw)

    gcr = gc_ref[g, 0:1, :]        # (1, P) lane-transposed color cotangent
    gcg = gc_ref[g, 1:2, :]
    gcb = gc_ref[g, 2:3, :]
    gd = gd_ref[g]                 # (1, P)
    ga = ga_ref[g]                 # (1, P)
    gt = gt_ref[g]                 # (1, P)
    Tfin = tfin_ref[g]             # (1, P)
    # B: gradient flowing into every committed alpha through T_final
    B = Tfin * (jnp.sum(bg_ref[...] * gc_ref[g], axis=0, keepdims=True)
                + gt)              # (1, P); bg rides as (3, P)

    S_s[...] = jnp.zeros((1, P))

    for c in range(n_chunks - 1, -1, -1):  # static reverse unroll
        sl = slice(c * ck, (c + 1) * ck)
        active = c * ck < count

        @pl.when(active)
        def _():
            idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
            live = (c * ck + idx) < count
            blk = attrs_ref[g, sl, :]
            alpha, raw, G, power, dx, dy, dead = _chunk_geometry(
                blk, live, px, py)

            T0 = tentry_ref[g, c:c + 1, :]                # (1, P) static c
            one_m = jnp.maximum(1.0 - alpha, _ONE_M_MIN)
            t_incl = _incl_prod(one_m, ck)
            t_after = T0 * t_incl
            t_before = t_after / one_m
            contrib = (t_after >= _T_EPS).astype(jnp.float32)
            w = alpha * t_before * contrib

            gsc = (blk[:, _A_R:_A_R + 1] * gcr + blk[:, _A_G:_A_G + 1] * gcg
                   + blk[:, _A_B:_A_B + 1] * gcb
                   + blk[:, _A_D:_A_D + 1] * gd + ga)     # (CK, P)
            wg = w * gsc
            pref_wg = _incl_scan(wg, ck)                  # inclusive
            total_wg = pref_wg[ck - 1:ck, :]              # (1, P)
            # strict within-chunk suffix + accumulated later-chunk suffix
            S_k = (total_wg - pref_wg) + S_s[...]

            dalpha = (t_before * gsc * contrib
                      - (S_k + B * contrib) / one_m)
            dalpha = jnp.where(dead | (raw >= 0.99), 0.0, dalpha)

            dop = jnp.sum(dalpha * G, axis=1, keepdims=True)   # (CK, 1)
            dpow = dalpha * blk[:, _A_OP:_A_OP + 1] * G
            da = -0.5 * jnp.sum(dpow * dx * dx, axis=1, keepdims=True)
            db = -jnp.sum(dpow * dx * dy, axis=1, keepdims=True)
            dc_ = -0.5 * jnp.sum(dpow * dy * dy, axis=1, keepdims=True)
            ddx = dpow * (-(blk[:, _A_CA:_A_CA + 1] * dx
                            + blk[:, _A_CB:_A_CB + 1] * dy))
            ddy = dpow * (-(blk[:, _A_CC:_A_CC + 1] * dy
                            + blk[:, _A_CB:_A_CB + 1] * dx))
            dmx = jnp.sum(ddx, axis=1, keepdims=True)
            dmy = jnp.sum(ddy, axis=1, keepdims=True)

            dcr = jnp.sum(w * gcr, axis=1, keepdims=True)
            dcg = jnp.sum(w * gcg, axis=1, keepdims=True)
            dcb = jnp.sum(w * gcb, axis=1, keepdims=True)
            ddep = jnp.sum(w * gd, axis=1, keepdims=True)

            dattrs_out[g, sl, :] = jnp.concatenate(
                [dmx, dmy, da, db, dc_, dcr, dcg, dcb, dop, ddep,
                 jnp.zeros((ck, ATTR_F - 10))], axis=1)

            S_s[...] += total_wg

        @pl.when(~active)
        def _():
            dattrs_out[g, sl, :] = jnp.zeros((ck, ATTR_F))


class PallasTiles(NamedTuple):
    color: jax.Array    # (T, P, 3)
    depth: jax.Array    # (T, P)
    alpha: jax.Array    # (T, P)
    tfin: jax.Array     # (T, P)


G_TILES = 4  # tiles per grid step (max)


def _g_for(K: int) -> int:
    """Tiles per grid step, adapted to the per-tile list length K.

    The statically-unrolled chunk loops allocate VMEM stack proportional to
    G * n_chunks; measured on v5e, K=2048 with G=4 exceeds the 16MB scoped
    limit by 37KB while K=512/G=4 fits. Scale G down so G*K <= 2048 chunks'
    worth (grid-step count G made no throughput difference in round-1
    sweeps, so this only buys headroom)."""
    return max(1, min(G_TILES, 2048 // max(K, 1)))


def _pad_tiles(arrs, T, G):
    Tp = -(-T // G) * G
    if Tp == T:
        return arrs, T
    out = []
    for a in arrs:
        pad = [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad))
    return out, Tp


def composite_tiles_pallas(tw, ck, interpret, counts, attrs, bg,
                           tile_ids=None):
    """Composite packed per-tile Gaussian tables.

    Args:
      tw: tile-grid width (tiles per image row).
      ck: chunk size (gaussians per inner step; divides capacity).
      interpret: run the Pallas interpreter (CPU tests).
      counts: (T,) int32 live entries per tile.
      attrs: (T, K, ATTR_F) packed per-slot attributes (layout _A*).
      bg: (3,) background color.
      tile_ids: (T,) int32 global tile id per table row (None = identity;
        the tile-sharded renderer passes its rank-offset block).
    """
    if tile_ids is None:
        tile_ids = jnp.arange(attrs.shape[0], dtype=jnp.int32)
    return _composite_vjp(tw, ck, interpret, counts, tile_ids, attrs, bg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _composite_vjp(tw, ck, interpret, counts, tile_ids, attrs, bg):
    out, _ = _fwd_impl(tw, ck, interpret, counts, tile_ids, attrs, bg)
    return out


def _fwd_impl(tw, ck, interpret, counts, tile_ids, attrs, bg):
    T, K = attrs.shape[:2]
    n_chunks = K // ck
    assert n_chunks * ck == K
    G = _g_for(K)
    (counts_p, tile_ids_p, attrs_p), Tp = _pad_tiles(
        [counts, tile_ids, attrs], T, G)

    kern = functools.partial(_fwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw,
                             g_tiles=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, K, ATTR_F), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((3, P), lambda t, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, 3, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, n_chunks, P), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, n_chunks, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts_p, tile_ids_p, attrs_p, jnp.broadcast_to(bg[:, None], (3, P)))
    colr, dep, acc, tfin, tentry = outs
    return PallasTiles(jnp.swapaxes(colr[:T], 1, 2), dep[:T, 0], acc[:T, 0],
                       tfin[:T, 0]), tentry


def _vjp_fwd(tw, ck, interpret, counts, tile_ids, attrs, bg):
    out, tentry = _fwd_impl(tw, ck, interpret, counts, tile_ids, attrs, bg)
    res = (counts, tile_ids, attrs, bg, tentry, out.tfin)
    return out, res


def _vjp_bwd(tw, ck, interpret, res, cot):
    counts, tile_ids, attrs, bg, tentry, tfin = res
    gc, gd, ga, gt = cot
    T, K = attrs.shape[:2]
    n_chunks = K // ck
    G = _g_for(K)
    gct = jnp.swapaxes(gc, 1, 2)  # (T, 3, P) lane-transposed outside
    (counts_p, tile_ids_p, attrs_p, gct_p, gd_p, ga_p, gt_p, tfin_p), Tp = \
        _pad_tiles([counts, tile_ids, attrs, gct, gd, ga, gt, tfin], T, G)
    # tentry was produced padded by _fwd_impl
    tentry_p = tentry

    kern = functools.partial(_bwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw,
                             g_tiles=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, K, ATTR_F), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((3, P), lambda t, *_: (0, 0)),
            pl.BlockSpec((G, n_chunks, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 3, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, K, ATTR_F), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    douts = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, K, ATTR_F), jnp.float32),
        ],
        interpret=interpret,
    )(counts_p, tile_ids_p, attrs_p, jnp.broadcast_to(bg[:, None], (3, P)),
      tentry_p, tfin_p[:, None, :], gct_p, gd_p[:, None, :],
      ga_p[:, None, :], gt_p[:, None, :])
    dattrs = douts[0]

    dbg = jnp.einsum("tp,tpc->c", tfin, gc)
    return (None, None, dattrs[:T], dbg)


_composite_vjp.defvjp(_vjp_fwd, _vjp_bwd)
