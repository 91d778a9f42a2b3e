"""Pallas fused tile-compositing kernel (forward + analytic backward).

The XLA composite (composite.py) is HBM-bound: every chunk step materializes
~15 (tiles, chunk, pixels) intermediates. This kernel keeps the whole
per-tile compositing chain in VMEM: one grid step = one 16x16 tile, looping
over its Gaussian list in CK-sized chunks with an early exit when the tile's
count is exhausted or every pixel is saturated. Transmittance prefix
products and the pixel reductions run as small matmuls on the MXU.

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

TPU lowering notes: per-gaussian vectors ride as (T, 1, K) arrays so block
shapes satisfy the (8, 128)-divisible-or-full rule; all kernel intermediates
stay >= 2-D.

n_touched is NOT produced here (the mapping hot loop doesn't need it; the
covisibility render uses the XLA path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE

P = TILE * TILE          # pixels per tile
_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
_ONE_M_MIN = 0.01        # 1 - alpha >= 1 - 0.99


def _tri(ck, strict):
    r = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 1)
    return ((c < r) if strict else (c <= r)).astype(jnp.float32)


def _triu_strict(ck):
    r = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 1)
    return (c > r).astype(jnp.float32)


def _pixel_coords(t, tw):
    """Pixel (x, y) float coords of tile t as (1, P) rows."""
    ty = (t // tw).astype(jnp.float32)
    tx = (t % tw).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = tx * TILE + (lin % TILE).astype(jnp.float32)
    py = ty * TILE + (lin // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(mean, conic, opc, live, px, py):
    """alpha (CK, P): mean (CK,2), conic (CK,3), opc/live (CK,1)."""
    dx = mean[:, 0:1] - px            # (CK, P)
    dy = mean[:, 1:2] - py
    power = (-0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
             - conic[:, 1:2] * dx * dy)
    alpha = jnp.minimum(0.99, opc * jnp.exp(power))
    alpha = jnp.where((power > 0) | (alpha < _ALPHA_MIN) | ~live, 0.0, alpha)
    return alpha


def _fwd_kernel(counts_ref, mean_ref, conic_ref, color_ref, op_ref, depth_ref,
                bg_ref, color_out, depth_out, alpha_out, tfin_out,
                tentry_out, T_s, Tc_s, rgb_s, dep_s, acc_s,
                *, ck, n_chunks, tw, g_tiles):
    step = pl.program_id(0)
    L = _tri(ck, strict=False)
    for g in range(g_tiles):
        _fwd_one_tile(step * g_tiles + g, g, counts_ref, mean_ref, conic_ref,
                      color_ref, op_ref, depth_ref, bg_ref, color_out,
                      depth_out, alpha_out, tfin_out, tentry_out, T_s, Tc_s,
                      rgb_s, dep_s, acc_s, L, ck=ck, n_chunks=n_chunks,
                      tw=tw)


def _fwd_one_tile(t, g, counts_ref, mean_ref, conic_ref, color_ref, op_ref,
                  depth_ref, bg_ref, color_out, depth_out, alpha_out,
                  tfin_out, tentry_out, T_s, Tc_s, rgb_s, dep_s, acc_s, L,
                  *, ck, n_chunks, tw):
    count = counts_ref[t]
    px, py = _pixel_coords(t, tw)

    T_s[...] = jnp.ones((1, P))
    Tc_s[...] = jnp.full((1, P), jnp.inf)
    rgb_s[...] = jnp.zeros((P, 3))
    dep_s[...] = jnp.zeros((1, P))
    acc_s[...] = jnp.zeros((1, P))

    for c in range(n_chunks):  # static unroll; @pl.when does the early exit
        tentry_out[g, c, :] = T_s[0, :]

        @pl.when((c * ck < count) & (jnp.max(T_s[...]) >= _T_EPS))
        def _():
            sl = slice(c * ck, (c + 1) * ck)
            idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
            live = (c * ck + idx) < count                 # (CK, 1)
            opc = op_ref[g, sl, :]                        # (CK, 1)
            alpha = _chunk_alpha(mean_ref[g, sl, :], conic_ref[g, sl, :],
                                 opc, live, px, py)
            lg = jnp.log(jnp.maximum(1.0 - alpha, _ONE_M_MIN))
            t_incl = jnp.exp(jnp.dot(L, lg,
                                     preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST))
            T = T_s[...]
            t_after = T * t_incl                          # (CK, P)
            t_before = t_after / jnp.maximum(1.0 - alpha, _ONE_M_MIN)
            contrib = (t_after >= _T_EPS).astype(jnp.float32)
            w = alpha * t_before * contrib                # (CK, P)

            rgb_s[...] += jnp.dot(w.T, color_ref[g, sl, :],
                                  preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            dpc = depth_ref[g, sl, :]                     # (CK, 1)
            dep_s[...] += jnp.sum(w * dpc, axis=0, keepdims=True)
            acc_s[...] += jnp.sum(w, axis=0, keepdims=True)

            cand = jnp.where(t_after >= _T_EPS, t_after, jnp.inf)
            Tc_s[...] = jnp.minimum(Tc_s[...],
                                    jnp.min(cand, axis=0, keepdims=True))
            T_s[...] = t_after[ck - 1:ck, :]

    T = T_s[...]
    Tfin = jnp.where(jnp.isinf(Tc_s[...]), T, Tc_s[...])  # (1, P)
    color_out[g] = rgb_s[...] + jnp.transpose(Tfin) * bg_ref[0]
    depth_out[g] = dep_s[...]
    alpha_out[g] = acc_s[...]
    tfin_out[g] = Tfin


def _bwd_kernel(counts_ref, mean_ref, conic_ref, color_ref, op_ref, depth_ref,
                bg_ref, tentry_ref, tfin_ref, gc_ref, gd_ref, ga_ref, gt_ref,
                dmean_out, dconic_out, dcolor_out, dop_out, ddepth_out,
                S_s, *, ck, n_chunks, tw, g_tiles):
    step = pl.program_id(0)
    L = _tri(ck, strict=False)
    U = _triu_strict(ck)
    for g in range(g_tiles):
        # pallas outputs are uninitialized; inactive chunks must be zero
        dmean_out[g] = jnp.zeros_like(dmean_out[g])
        dconic_out[g] = jnp.zeros_like(dconic_out[g])
        dcolor_out[g] = jnp.zeros_like(dcolor_out[g])
        dop_out[g] = jnp.zeros_like(dop_out[g])
        ddepth_out[g] = jnp.zeros_like(ddepth_out[g])
    for g in range(g_tiles):
        _bwd_one_tile(step * g_tiles + g, g, counts_ref, mean_ref, conic_ref,
                      color_ref, op_ref, depth_ref, bg_ref, tentry_ref,
                      tfin_ref, gc_ref, gd_ref, ga_ref, gt_ref, dmean_out,
                      dconic_out, dcolor_out, dop_out, ddepth_out, S_s, L, U,
                      ck=ck, n_chunks=n_chunks, tw=tw)


def _bwd_one_tile(t, g, counts_ref, mean_ref, conic_ref, color_ref, op_ref,
                  depth_ref, bg_ref, tentry_ref, tfin_ref, gc_ref, gd_ref,
                  ga_ref, gt_ref, dmean_out, dconic_out, dcolor_out, dop_out,
                  ddepth_out, S_s, L, U, *, ck, n_chunks, tw):
    count = counts_ref[t]
    px, py = _pixel_coords(t, tw)

    gc = gc_ref[g]                 # (P, 3)
    gd = gd_ref[g]                 # (1, P)
    ga = ga_ref[g]                 # (1, P)
    gt = gt_ref[g]                 # (1, P)
    Tfin = tfin_ref[g]             # (1, P)
    bg = bg_ref[0]                 # (1, 3)
    # B: gradient flowing into every committed alpha through T_final
    B = Tfin * (jnp.transpose(
        jnp.dot(gc, jnp.transpose(bg),
                preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)) + gt)  # (1, P)

    S_s[...] = jnp.zeros((1, P))

    for c in range(n_chunks - 1, -1, -1):  # static reverse unroll
        sl = slice(c * ck, (c + 1) * ck)
        active = c * ck < count

        @pl.when(active)
        def _():
            idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
            live = (c * ck + idx) < count
            mean = mean_ref[g, sl, :]
            conic = conic_ref[g, sl, :]
            opc = op_ref[g, sl, :]                        # (CK, 1)
            colr = color_ref[g, sl, :]
            dpc = depth_ref[g, sl, :]                     # (CK, 1)

            dx = mean[:, 0:1] - px
            dy = mean[:, 1:2] - py
            power = (-0.5 * (conic[:, 0:1] * dx * dx
                             + conic[:, 2:3] * dy * dy)
                     - conic[:, 1:2] * dx * dy)
            G = jnp.exp(power)
            raw = opc * G
            alpha = jnp.minimum(0.99, raw)
            dead = (power > 0) | (alpha < _ALPHA_MIN) | ~live
            alpha = jnp.where(dead, 0.0, alpha)

            T0 = tentry_ref[g, c:c + 1, :]                # (1, P) static c
            lg = jnp.log(jnp.maximum(1.0 - alpha, _ONE_M_MIN))
            t_incl = jnp.exp(jnp.dot(L, lg,
                                     preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST))
            t_after = T0 * t_incl
            one_m = jnp.maximum(1.0 - alpha, _ONE_M_MIN)
            t_before = t_after / one_m
            contrib = (t_after >= _T_EPS).astype(jnp.float32)
            w = alpha * t_before * contrib

            gsc = (jnp.dot(colr, gc.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
                   + dpc * gd + ga)                       # (CK, P)
            wg = w * gsc
            S_k = jnp.dot(U, wg, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) + S_s[...]

            dalpha = (t_before * gsc * contrib
                      - (S_k + B * contrib) / one_m)
            dalpha = jnp.where(dead | (raw >= 0.99), 0.0, dalpha)

            dop = jnp.sum(dalpha * G, axis=1, keepdims=True)   # (CK, 1)
            dG = dalpha * opc
            dpow = dG * G
            da = -0.5 * jnp.sum(dpow * dx * dx, axis=1, keepdims=True)
            db = -jnp.sum(dpow * dx * dy, axis=1, keepdims=True)
            dc_ = -0.5 * jnp.sum(dpow * dy * dy, axis=1, keepdims=True)
            ddx = dpow * (-(conic[:, 0:1] * dx + conic[:, 1:2] * dy))
            ddy = dpow * (-(conic[:, 2:3] * dy + conic[:, 1:2] * dx))
            dmx = jnp.sum(ddx, axis=1, keepdims=True)
            dmy = jnp.sum(ddy, axis=1, keepdims=True)

            dcol = jnp.dot(w, gc, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            ddep = jnp.sum(w * gd, axis=1, keepdims=True)

            dmean_out[g, sl, :] = jnp.concatenate([dmx, dmy], axis=1)
            dconic_out[g, sl, :] = jnp.concatenate([da, db, dc_], axis=1)
            dcolor_out[g, sl, :] = dcol
            dop_out[g, sl, :] = dop
            ddepth_out[g, sl, :] = ddep

            S_s[...] += jnp.sum(wg, axis=0, keepdims=True)

        @pl.when(~active)
        def _():
            zc1 = jnp.zeros((ck, 1))
            dmean_out[g, sl, :] = jnp.zeros((ck, 2))
            dconic_out[g, sl, :] = jnp.zeros((ck, 3))
            dcolor_out[g, sl, :] = jnp.zeros((ck, 3))
            dop_out[g, sl, :] = zc1
            ddepth_out[g, sl, :] = zc1


class PallasTiles(NamedTuple):
    color: jax.Array    # (T, P, 3)
    depth: jax.Array    # (T, P)
    alpha: jax.Array    # (T, P)
    tfin: jax.Array     # (T, P)


G_TILES = 4  # tiles per grid step (VMEM-bounded: bwd blocks ~9MB at G=4)


def _pad_tiles(arrs, T, G):
    Tp = -(-T // G) * G
    if Tp == T:
        return arrs, T
    out = []
    for a in arrs:
        pad = [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad))
    return out, Tp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def composite_tiles_pallas(tw, ck, interpret, counts, mean, conic, color, op,
                           depth, bg):
    out, _ = _fwd_impl(tw, ck, interpret, counts, mean, conic, color, op,
                       depth, bg)
    return out


def _fwd_impl(tw, ck, interpret, counts, mean, conic, color, op, depth, bg):
    T, K = mean.shape[:2]
    n_chunks = K // ck
    assert n_chunks * ck == K
    G = G_TILES
    (counts_p, mean_p, conic_p, color_p, op_p, depth_p), Tp = _pad_tiles(
        [counts, mean, conic, color, op, depth], T, G)

    kern = functools.partial(_fwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw,
                             g_tiles=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 3), lambda t, c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, P, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, n_chunks, P), lambda t, c: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((P, 3), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((Tp, n_chunks, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts_p, mean_p, conic_p, color_p, op_p[:, :, None],
      depth_p[:, :, None], bg[None, :])
    colr, dep, acc, tfin, tentry = outs
    return PallasTiles(colr[:T], dep[:T, 0], acc[:T, 0], tfin[:T, 0]), tentry


def _vjp_fwd(tw, ck, interpret, counts, mean, conic, color, op, depth, bg):
    out, tentry = _fwd_impl(tw, ck, interpret, counts, mean, conic, color,
                            op, depth, bg)
    res = (counts, mean, conic, color, op, depth, bg, tentry, out.tfin)
    return out, res


def _vjp_bwd(tw, ck, interpret, res, cot):
    counts, mean, conic, color, op, depth, bg, tentry, tfin = res
    gc, gd, ga, gt = cot
    T, K = mean.shape[:2]
    n_chunks = K // ck
    G = G_TILES
    (counts_p, mean_p, conic_p, color_p, op_p, depth_p, gc_p, gd_p, ga_p,
     gt_p, tfin_p), Tp = _pad_tiles(
        [counts, mean, conic, color, op, depth, gc, gd, ga, gt, tfin], T, G)
    # tentry was produced padded by _fwd_impl
    tentry_p = tentry

    kern = functools.partial(_bwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw,
                             g_tiles=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // G,),
        in_specs=[
            pl.BlockSpec((G, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 3), lambda t, c: (0, 0)),
            pl.BlockSpec((G, n_chunks, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, P, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, 1, P), lambda t, c: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((G, K, 1), lambda t, c: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    douts = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((Tp, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((Tp, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((Tp, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((Tp, K, 1), jnp.float32),
        ],
        interpret=interpret,
    )(counts_p, mean_p, conic_p, color_p, op_p[:, :, None],
      depth_p[:, :, None], bg[None, :], tentry_p, tfin_p[:, None, :], gc_p,
      gd_p[:, None, :], ga_p[:, None, :], gt_p[:, None, :])
    dmean, dconic, dcolor, dop, ddepth = douts

    dbg = jnp.einsum("tp,tpc->c", tfin, gc)
    return (None, dmean[:T], dconic[:T], dcolor[:T], dop[:T, :, 0],
            ddepth[:T, :, 0], dbg)


composite_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
