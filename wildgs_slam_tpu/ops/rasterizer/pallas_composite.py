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
                tentry_out, *, ck, n_chunks, tw):
    t = pl.program_id(0)
    count = counts_ref[t]
    px, py = _pixel_coords(t, tw)
    L = _tri(ck, strict=False)

    def body(carry):
        c, T, Tcomm, rgb, dep, acc = carry
        tentry_out[0, c, :] = T[0]
        sl = pl.ds(c * ck, ck)
        idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
        live = (c * ck + idx) < count                     # (CK, 1)
        opc = jnp.transpose(op_ref[0, 0:1, sl])           # (CK, 1)
        alpha = _chunk_alpha(mean_ref[0, sl, :], conic_ref[0, sl, :],
                             opc, live, px, py)
        lg = jnp.log(jnp.maximum(1.0 - alpha, _ONE_M_MIN))
        t_incl = jnp.exp(jnp.dot(L, lg, preferred_element_type=jnp.float32))
        t_after = T * t_incl                              # (CK, P)
        t_before = t_after / jnp.maximum(1.0 - alpha, _ONE_M_MIN)
        contrib = (t_after >= _T_EPS).astype(jnp.float32)
        w = alpha * t_before * contrib                    # (CK, P)

        rgb = rgb + jnp.dot(w.T, color_ref[0, sl, :],
                            preferred_element_type=jnp.float32)   # (P, 3)
        dpc = jnp.transpose(depth_ref[0, 0:1, sl])        # (CK, 1)
        dep = dep + jnp.sum(w * dpc, axis=0, keepdims=True)
        acc = acc + jnp.sum(w, axis=0, keepdims=True)

        cand = jnp.where(t_after >= _T_EPS, t_after, jnp.inf)
        Tcomm = jnp.minimum(Tcomm, jnp.min(cand, axis=0, keepdims=True))
        T = t_after[ck - 1:ck, :]
        return c + 1, T, Tcomm, rgb, dep, acc

    def cond(carry):
        c, T, *_ = carry
        return (c * ck < count) & (c < n_chunks) & (jnp.max(T) >= _T_EPS)

    init = (jnp.int32(0), jnp.ones((1, P)), jnp.full((1, P), jnp.inf),
            jnp.zeros((P, 3)), jnp.zeros((1, P)), jnp.zeros((1, P)))
    c_end, T, Tcomm, rgb, dep, acc = jax.lax.while_loop(cond, body, init)

    # chunks never entered still need a defined T_entry (= current T)
    def fill(carry):
        c, = carry
        tentry_out[0, c, :] = T[0]
        return (c + 1,)

    jax.lax.while_loop(lambda s: s[0] < n_chunks, fill, (c_end,))

    Tfin = jnp.where(jnp.isinf(Tcomm), T, Tcomm)          # (1, P)
    color_out[0] = rgb + jnp.transpose(Tfin) * bg_ref[0]
    depth_out[0] = dep
    alpha_out[0] = acc
    tfin_out[0] = Tfin


def _bwd_kernel(counts_ref, mean_ref, conic_ref, color_ref, op_ref, depth_ref,
                bg_ref, tentry_ref, tfin_ref, gc_ref, gd_ref, ga_ref, gt_ref,
                dmean_out, dconic_out, dcolor_out, dop_out, ddepth_out,
                *, ck, n_chunks, tw):
    t = pl.program_id(0)
    count = counts_ref[t]
    px, py = _pixel_coords(t, tw)
    L = _tri(ck, strict=False)
    U = _triu_strict(ck)

    # pallas outputs are uninitialized; chunks skipped below must be zero
    dmean_out[0] = jnp.zeros_like(dmean_out[0])
    dconic_out[0] = jnp.zeros_like(dconic_out[0])
    dcolor_out[0] = jnp.zeros_like(dcolor_out[0])
    dop_out[0] = jnp.zeros_like(dop_out[0])
    ddepth_out[0] = jnp.zeros_like(ddepth_out[0])

    gc = gc_ref[0]                 # (P, 3)
    gd = gd_ref[0]                 # (1, P)
    ga = ga_ref[0]                 # (1, P)
    gt = gt_ref[0]                 # (1, P)
    Tfin = tfin_ref[0]             # (1, P)
    bg = bg_ref[0]                 # (1, 3)
    # B: gradient flowing into every committed alpha through T_final
    B = Tfin * (jnp.transpose(
        jnp.dot(gc, jnp.transpose(bg),
                preferred_element_type=jnp.float32)) + gt)  # (1, P)

    n_active = jnp.minimum((count + ck - 1) // ck, n_chunks)

    def body(carry):
        i, S = carry                      # S (1, P): suffix from later chunks
        c = n_active - 1 - i
        sl = pl.ds(c * ck, ck)
        idx = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
        live = (c * ck + idx) < count
        mean = mean_ref[0, sl, :]
        conic = conic_ref[0, sl, :]
        opc = jnp.transpose(op_ref[0, 0:1, sl])           # (CK, 1)
        colr = color_ref[0, sl, :]
        dpc = jnp.transpose(depth_ref[0, 0:1, sl])        # (CK, 1)

        dx = mean[:, 0:1] - px
        dy = mean[:, 1:2] - py
        power = (-0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
                 - conic[:, 1:2] * dx * dy)
        G = jnp.exp(power)
        raw = opc * G
        alpha = jnp.minimum(0.99, raw)
        dead = (power > 0) | (alpha < _ALPHA_MIN) | ~live
        alpha = jnp.where(dead, 0.0, alpha)

        T0 = tentry_ref[0, pl.ds(c, 1), :]                # (1, P)
        lg = jnp.log(jnp.maximum(1.0 - alpha, _ONE_M_MIN))
        t_incl = jnp.exp(jnp.dot(L, lg, preferred_element_type=jnp.float32))
        t_after = T0 * t_incl
        one_m = jnp.maximum(1.0 - alpha, _ONE_M_MIN)
        t_before = t_after / one_m
        contrib = (t_after >= _T_EPS).astype(jnp.float32)
        w = alpha * t_before * contrib

        # per-element pixel score g_k
        g = (jnp.dot(colr, gc.T, preferred_element_type=jnp.float32)
             + dpc * gd + ga)                             # (CK, P)
        wg = w * g
        S_k = jnp.dot(U, wg, preferred_element_type=jnp.float32) + S

        dalpha = t_before * g * contrib - (S_k + B * contrib) / one_m
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

        dcol = jnp.dot(w, gc, preferred_element_type=jnp.float32)  # (CK, 3)
        ddep = jnp.sum(w * gd, axis=1, keepdims=True)      # (CK, 1)

        dmean_out[0, sl, :] = jnp.concatenate([dmx, dmy], axis=1)
        dconic_out[0, sl, :] = jnp.concatenate([da, db, dc_], axis=1)
        dcolor_out[0, sl, :] = dcol
        dop_out[0, 0:1, sl] = jnp.transpose(dop)
        ddepth_out[0, 0:1, sl] = jnp.transpose(ddep)

        S = S + jnp.sum(wg, axis=0, keepdims=True)
        return i + 1, S

    def cond(carry):
        i, _ = carry
        return i < n_active

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((1, P))))


class PallasTiles(NamedTuple):
    color: jax.Array    # (T, P, 3)
    depth: jax.Array    # (T, P)
    alpha: jax.Array    # (T, P)
    tfin: jax.Array     # (T, P)


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

    kern = functools.partial(_fwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 3), lambda t, c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, n_chunks, P), lambda t, c: (t, 0, 0)),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, n_chunks, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts, mean, conic, color, op[:, None, :], depth[:, None, :],
      bg[None, :])
    colr, dep, acc, tfin, tentry = outs
    return PallasTiles(colr, dep[:, 0], acc[:, 0], tfin[:, 0]), tentry


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

    kern = functools.partial(_bwd_kernel, ck=ck, n_chunks=n_chunks, tw=tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 3), lambda t, c: (0, 0)),
            pl.BlockSpec((1, n_chunks, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, P, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K, 2), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, K, 3), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda t, c: (t, 0, 0)),
        ],
    )
    douts = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((T, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((T, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, K), jnp.float32),
        ],
        interpret=interpret,
    )(counts, mean, conic, color, op[:, None, :], depth[:, None, :],
      bg[None, :], tentry, tfin[:, None, :], gc, gd[:, None, :],
      ga[:, None, :], gt[:, None, :])
    dmean, dconic, dcolor, dop, ddepth = douts

    dbg = jnp.einsum("tp,tpc->c", tfin, gc)
    return (None, dmean, dconic, dcolor, dop[:, 0], ddepth[:, 0], dbg)


composite_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
