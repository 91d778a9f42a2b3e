"""TPU-native differentiable Gaussian rasterizer.

Replaces the CUDA `diff-gaussian-rasterization-w-pose` extension used by the
reference (API at
/root/reference/thirdparty/gaussian_splatting/gaussian_renderer/__init__.py:58-141)
with a three-phase XLA design:

  1. projection (projection.py)  — batched 3D->2D transform, EWA covariance,
     SH colors; camera-pose gradients via SE3 retraction + autodiff.
  2. binning (binning.py)        — global depth sort + per-tile fixed-capacity
     index tables (static shapes for XLA).
  3. compositing (composite.py)  — all-tiles-at-once front-to-back blending,
     chunked scan with rematerialization.

Outputs match the reference rasterizer: color, radii, depth, opacity(alpha),
n_touched, plus screen-space mean gradients for densification via the
`mean2d_offset` zero-input (the JAX analogue of means2D.retain_grad()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import binning, composite, projection
from .binning import TILE, bin_gaussians
from .composite import RenderOutput, untile
from .projection import ProjectedGaussians, project_gaussians


@jax.custom_vjp
def _gather_rows_rev(attrs, safe_ids, rev_pos, rev_live):
    """attrs[safe_ids] with a gather-based backward.

    XLA lowers the natural scatter-add VJP of a row gather serially on TPU
    (measured 0.45 ms/iter at bench scale). The 'sort' binning emits a
    reverse index — for each (gaussian, bbox-window slot) the flattened
    table position it landed at — so the cotangent can instead be GATHERED
    back: grad_attrs[n] = sum_k live(n,k) * ct_flat[rev_pos[n,k]].
    """
    return attrs[safe_ids]


def _gather_rows_rev_fwd(attrs, safe_ids, rev_pos, rev_live):
    return attrs[safe_ids], (rev_pos, rev_live)


def _gather_rows_rev_bwd(res, ct):
    rev_pos, rev_live = res
    F = ct.shape[-1]
    ctf = ct.reshape(-1, F)
    rows = ctf[rev_pos.reshape(-1)]
    rows = jnp.where(rev_live.reshape(-1, 1), rows, 0.0)
    ga = rows.reshape(rev_pos.shape[0], rev_pos.shape[1], F).sum(axis=1)
    return ga, None, None, None


_gather_rows_rev.defvjp(_gather_rows_rev_fwd, _gather_rows_rev_bwd)


@jax.custom_vjp
def _gather_rows_mm(attrs, safe_ids):
    """attrs[safe_ids] with a matmul-based (segment-sum) backward.

    XLA lowers the natural scatter-add VJP of the (T, cap) row gather
    serially on TPU (~0.45 ms/iter at bench scale). Here the backward is a
    digit-decomposed one-hot contraction on the MXU instead:

        n == hi*L + lo,  grad[hi*L+lo, f] = sum_s A[s,hi] * (B[s,lo]*ct[s,f])

    with A = onehot(ids//L) (S, NH) bf16 and BC = onehot(ids%L)[..,None]*ct
    (S, L, F). One einsum 'sh,slf->hlf' contracts over all S=T*cap slots —
    build volume S*(NH + L*F) elements and S*NH*L*F MACs; for bench scale
    (S=57.6k, N=5.1k, F=16, L=16) that's ~33M builds + 9.4 GFLOP: far off
    the serial scatter path. Cotangents of empty slots are zero (the
    composite masks by count), so safe_ids needs no -1 handling.
    """
    return attrs[safe_ids]


def _gather_rows_mm_fwd(attrs, safe_ids):
    return attrs[safe_ids], (safe_ids, attrs.shape[0])


def _pick_digit(n: int) -> int:
    # minimize NH + L*2F for n = NH*L (the backward stacks hi/lo cotangent
    # halves on the F axis, so bc is (S, L, 2F)); power-of-two L
    best, bl = None, 1
    for l in (8, 16, 32, 64):
        nh = -(-n // l)
        cost = nh + l * 32
        if best is None or cost < best:
            best, bl = cost, l
    return bl


def _gather_rows_mm_bwd(res, ct):
    safe_ids, n = res
    F = ct.shape[-1]
    ctf = ct.reshape(-1, F)
    ids = safe_ids.reshape(-1)
    L = _pick_digit(n)
    NH = -(-n // L)
    hi = (ids // L).astype(jnp.int32)
    lo = (ids - hi * L).astype(jnp.int32)
    # bf16 operands hit the MXU's native rate on TPU; CPU XLA has no
    # bf16xbf16->f32 dot, so tests fall back to f32. The hi/lo split bounds
    # the cotangent rounding error at ~2^-18 relative (the residual is
    # itself bf16-rounded), not exactly zero — gradient tests at 1e-5 rel
    # tolerance sit within ~5x of this floor.
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    a = (hi[:, None] == jnp.arange(NH, dtype=jnp.int32)[None, :]).astype(
        dt)                                                       # (S, NH)
    b = (lo[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :])  # (S, L)
    # split ct into bf16 hi+lo halves so the bf16 MXU passes reproduce fp32;
    # stacked on the F axis -> ONE einsum pass over the big one-hot
    ct_h = ctf.astype(jnp.bfloat16).astype(dt)
    ct_l = (ctf - ctf.astype(jnp.bfloat16).astype(jnp.float32)).astype(
        jnp.bfloat16).astype(dt)
    ct2 = jnp.concatenate([ct_h, ct_l], axis=-1)                  # (S, 2F)
    bc = b[:, :, None] * ct2[:, None, :]                          # (S, L, 2F)
    e = jnp.einsum("sh,slf->hlf", a, bc,
                   preferred_element_type=jnp.float32)
    ga = (e[..., :F] + e[..., F:]).reshape(NH * L, F)
    return ga[:n], None


_gather_rows_mm.defvjp(_gather_rows_mm_fwd, _gather_rows_mm_bwd)


def render(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    sh_coeffs: jax.Array,
    w2c: jax.Array,
    intrinsics: jax.Array,
    image_size: tuple[int, int],
    sh_degree: int = 0,
    pose_delta: jax.Array | None = None,
    bg: jax.Array | None = None,
    capacity: int = 1024,
    chunk: int = 64,
    scale_modifier: float = 1.0,
    mean2d_offset: jax.Array | None = None,
    alive: jax.Array | None = None,
    bin_method: str = "onehot",
    bin_kw: int = 4,
    bin_seg_cap: int = 64,
) -> RenderOutput:
    """Render Gaussians into a pinhole camera. All inputs post-activation.

    `alive` masks dead capacity slots of a fixed-size GaussianModel.
    Differentiable w.r.t. every float input including `pose_delta` (camera
    pose twist, evaluate at zeros) and `mean2d_offset` (screen-space means,
    evaluate at zeros — gradient drives densification).
    """
    if bg is None:
        bg = jnp.zeros(3, dtype=means3d.dtype)

    proj = project_gaussians(
        means3d, scales, rotations, opacities, sh_coeffs, w2c, intrinsics,
        image_size, sh_degree=sh_degree, pose_delta=pose_delta,
        scale_modifier=scale_modifier,
    )
    valid = proj.valid if alive is None else proj.valid & alive
    mean2d = proj.mean2d if mean2d_offset is None else proj.mean2d + mean2d_offset

    bins = bin_gaussians(
        jax.lax.stop_gradient(mean2d),
        proj.radius,
        jax.lax.stop_gradient(proj.depth),
        valid,
        image_size,
        capacity=capacity,
        method="sort" if bin_method == "sort_norev" else bin_method,
        kw=bin_kw,
        seg_cap=bin_seg_cap,
        with_rev=bin_method != "sort_norev",
    )

    tiles_color, tiles_depth, tiles_alpha, n_touched, _ = composite.composite(
        bins, mean2d, proj.conic, proj.color, proj.opacity, proj.depth,
        image_size, bg, chunk=chunk,
    )

    return RenderOutput(
        color=untile(tiles_color, image_size),
        depth=untile(tiles_depth, image_size),
        alpha=untile(tiles_alpha, image_size),
        n_touched=n_touched,
        radii=jnp.where(valid, proj.radius, 0),
        overflow=bins.overflow,
    )


def render_pallas(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    sh_coeffs: jax.Array,
    w2c: jax.Array,
    intrinsics: jax.Array,
    image_size: tuple[int, int],
    sh_degree: int = 0,
    pose_delta: jax.Array | None = None,
    bg: jax.Array | None = None,
    capacity: int = 256,
    chunk: int = 64,
    scale_modifier: float = 1.0,
    mean2d_offset: jax.Array | None = None,
    alive: jax.Array | None = None,
    interpret: bool | None = None,
    bin_method: str = "onehot",
    bin_kw: int = 4,
    bin_seg_cap: int = 64,
) -> RenderOutput:
    """Fast path: fused Pallas tile compositing (no n_touched — the mapping
    hot loop doesn't need it; use render() for covisibility queries)."""
    from . import pallas_composite as pc

    if bg is None:
        bg = jnp.zeros(3, dtype=means3d.dtype)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    proj = project_gaussians(
        means3d, scales, rotations, opacities, sh_coeffs, w2c, intrinsics,
        image_size, sh_degree=sh_degree, pose_delta=pose_delta,
        scale_modifier=scale_modifier)
    valid = proj.valid if alive is None else proj.valid & alive
    mean2d = proj.mean2d if mean2d_offset is None else proj.mean2d + mean2d_offset

    # 'sort_norev' = sort binning WITHOUT the reverse index: the rev-gather
    # backward + inverse-permutation sort + rev_live plumbing measured
    # ~40 ms/iter of the 68 ms mapping iteration (N=131k trace,
    # scripts/profile_map_opt.py) while XLA's serial scatter-add costs only
    # ~3 ms at (T*cap)=393k rows — the rev index only pays off at small N
    with_rev = True
    method = bin_method
    if bin_method == "sort_norev":
        method, with_rev = "sort", False

    bins = bin_gaussians(
        jax.lax.stop_gradient(mean2d), proj.radius,
        jax.lax.stop_gradient(proj.depth), valid, image_size,
        capacity=capacity, method=method, kw=bin_kw,
        seg_cap=bin_seg_cap, with_rev=with_rev)

    # ONE lane-packed (N, 16) attribute table -> ONE row gather into the
    # per-tile tables (and one row scatter-add VJP). The round-1 design's
    # five separate per-column gathers lowered to serial element gathers
    # (~0.6 ms each on v5e) and dominated the whole rasterizer. Built as a
    # single 16-channel stack: concatenating (N,1)/(N,2)/(N,3) pieces left
    # XLA staging the narrow columns through T(1,128)-layout copies
    # (~3 ms/iter at mapping scale in the round-4 trace).
    zc = jnp.zeros_like(proj.depth)
    attrs = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1], proj.conic[:, 0], proj.conic[:, 1],
         proj.conic[:, 2], proj.color[:, 0], proj.color[:, 1],
         proj.color[:, 2], proj.opacity, proj.depth]
        + [zc] * (pc.ATTR_F - 10), axis=1)
    safe_ids = jnp.maximum(bins.ids, 0)
    if bins.rev_pos is not None:
        tile_attrs = _gather_rows_rev(attrs, safe_ids, bins.rev_pos,
                                      bins.rev_live)
    else:
        # matmul segment-sum backward when the one-hot build volume is sane
        # (bench scale: S*(NH+L*2F) ~ 38M elems); at mapping scale the sort
        # binning provides rev_pos and never reaches this branch. 2F because
        # the backward stacks hi/lo cotangent halves: bc is (S, L, 2F).
        n = attrs.shape[0]
        s = safe_ids.shape[0] * safe_ids.shape[1]
        l = _pick_digit(n)
        if s * (-(-n // l) + l * 2 * pc.ATTR_F) <= 256 * 1024 * 1024:
            tile_attrs = _gather_rows_mm(attrs, safe_ids)
        else:
            tile_attrs = attrs[safe_ids]
    tiles = pc.composite_tiles_pallas(
        binning.num_tiles(image_size)[1], chunk, interpret,
        bins.counts.astype(jnp.int32), tile_attrs, bg)

    return RenderOutput(
        color=untile(tiles.color, image_size),
        depth=untile(tiles.depth, image_size),
        alpha=untile(tiles.alpha, image_size),
        n_touched=jnp.zeros(means3d.shape[0], jnp.int32),
        radii=jnp.where(valid, proj.radius, 0),
        overflow=bins.overflow,
    )


def render_reference(
    means3d, scales, rotations, opacities, sh_coeffs, w2c, intrinsics,
    image_size, sh_degree=0, pose_delta=None, bg=None, alive=None,
):
    """Slow per-pixel oracle: every Gaussian against every pixel, no tiling.

    Used by the test suite to validate the tiled path (and later the Pallas
    kernel) bit-for-bit on tiny scenes. O(H·W·N) memory — tiny scenes only.
    """
    H, W = image_size
    if bg is None:
        bg = jnp.zeros(3, dtype=means3d.dtype)

    proj = project_gaussians(
        means3d, scales, rotations, opacities, sh_coeffs, w2c, intrinsics,
        image_size, sh_degree=sh_degree, pose_delta=pose_delta,
    )
    valid = proj.valid if alive is None else proj.valid & alive

    order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf))
    m = proj.mean2d[order]
    c = proj.conic[order]
    col = proj.color[order]
    op = jnp.where(valid, proj.opacity, 0.0)[order]
    dep = proj.depth[order]
    rad = proj.radius[order].astype(jnp.float32)

    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    px = x.reshape(-1)[:, None]  # (HW, 1)
    py = y.reshape(-1)[:, None]

    dx = m[None, :, 0] - px
    dy = m[None, :, 1] - py
    power = (-0.5 * (c[None, :, 0] * dx * dx + c[None, :, 2] * dy * dy)
             - c[None, :, 1] * dx * dy)
    alpha = jnp.minimum(0.99, op[None, :] * jnp.exp(power))
    alpha = jnp.where((power > 0) | (alpha < 1.0 / 255.0), 0.0, alpha)
    # tile-granular 3-sigma bbox truncation, exactly as the CUDA rasterizer
    # (and our tiled path) bins gaussians: a pixel only sees gaussians whose
    # radius bbox intersects its TILE
    tx = jnp.floor(px / TILE)
    ty = jnp.floor(py / TILE)
    in_bbox = (
        (jnp.floor((m[None, :, 0] - rad[None, :]) / TILE) <= tx)
        & (jnp.floor((m[None, :, 0] + rad[None, :]) / TILE) >= tx)
        & (jnp.floor((m[None, :, 1] - rad[None, :]) / TILE) <= ty)
        & (jnp.floor((m[None, :, 1] + rad[None, :]) / TILE) >= ty)
    )
    alpha = jnp.where(in_bbox, alpha, 0.0)

    t_incl = jnp.cumprod(1.0 - alpha, axis=1)
    t_before = jnp.concatenate([jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]],
                               axis=1)
    contrib = t_incl >= 1e-4
    w = alpha * t_before * contrib

    rgb = w @ col
    depth_img = jnp.sum(w * dep[None, :], axis=1)
    alpha_img = jnp.sum(w, axis=1)
    cand = jnp.where(t_incl >= 1e-4, t_incl, jnp.inf)
    T_final = jnp.minimum(jnp.min(cand, axis=1), 1.0)
    T_final = jnp.where(jnp.isinf(T_final), t_incl[:, -1], T_final)
    rgb = rgb + T_final[:, None] * bg[None, :]

    touched_sorted = jnp.sum(w > 0, axis=0).astype(jnp.int32)
    n_touched = jnp.zeros(means3d.shape[0], jnp.int32).at[order].set(
        touched_sorted
    )

    return RenderOutput(
        color=rgb.reshape(H, W, 3),
        depth=depth_img.reshape(H, W),
        alpha=alpha_img.reshape(H, W),
        n_touched=n_touched,
        radii=jnp.where(valid, proj.radius, 0),
        overflow=jnp.zeros((), jnp.int32),
    )
