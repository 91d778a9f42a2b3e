"""Tracking / mapping / uncertainty losses (pure JAX).

Ports the semantics of the reference's src/utils/slam_utils.py (tracking +
mapping losses) and src/utils/dyn_uncertainty/mapping_utils.py (the
NeRF-on-the-go-style uncertainty loss that drives distractor suppression).
Images are (H, W, 3); depths (H, W); uncertainties live on the DINO patch
grid (H/14, W/14) and are resampled bilinearly to pixels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ssim as ssim_ops

DEPTH_MAX_CLIP = 5.0
EPSILON = ssim_ops.EPSILON


# ---------------------------------------------------------------------------
# image gradients (Scharr) + grad mask (slam_utils.py:10-44, camera_utils 157-180)
# ---------------------------------------------------------------------------

def image_gradient(gray: jax.Array):
    """Scharr gradients of (H, W) image -> (grad_v, grad_h)."""
    conv_y = jnp.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], jnp.float32)
    conv_x = jnp.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]], jnp.float32)
    norm = 1.0 / jnp.abs(conv_y).sum()
    p = jnp.pad(gray, 1, mode="reflect")[None, None]
    dn = jax.lax.conv_dimension_numbers(p.shape, (1, 1, 3, 3),
                                        ("NCHW", "OIHW", "NCHW"))
    gv = jax.lax.conv_general_dilated(p, conv_x[None, None], (1, 1), "VALID",
                                      dimension_numbers=dn)[0, 0]
    gh = jax.lax.conv_general_dilated(p, conv_y[None, None], (1, 1), "VALID",
                                      dimension_numbers=dn)[0, 0]
    return norm * gv, norm * gh


def image_gradient_mask(gray: jax.Array, eps: float = 0.01):
    """3x3 all-valid masks (slam_utils.py:30-44)."""
    p = (jnp.abs(jnp.pad(gray, 1, mode="reflect")) > eps).astype(jnp.float32)
    k = jnp.ones((1, 1, 3, 3), jnp.float32)
    dn = jax.lax.conv_dimension_numbers((1, 1) + p.shape, (1, 1, 3, 3),
                                        ("NCHW", "OIHW", "NCHW"))
    s = jax.lax.conv_general_dilated(p[None, None], k, (1, 1), "VALID",
                                     dimension_numbers=dn)[0, 0]
    return s == 9.0, s == 9.0


def compute_grad_mask(image: jax.Array, edge_threshold: float,
                      blocks: int = 32) -> jax.Array:
    """Per-block median-thresholded Scharr edge mask
    (camera_utils.py:157-180). image (H, W, 3) -> (H, W) 0/1 mask.
    Requires H, W divisible by `blocks` after integer truncation (the
    reference silently drops the remainder; we do the same)."""
    gray = image.mean(-1)
    gv, gh = image_gradient(gray)
    mv, mh = image_gradient_mask(gray)
    intensity = jnp.sqrt((gv * mv) ** 2 + (gh * mh) ** 2)
    H, W = intensity.shape
    bh, bw = H // blocks, W // blocks
    core = intensity[: bh * blocks, : bw * blocks]
    tiles = core.reshape(blocks, bh, blocks, bw).transpose(0, 2, 1, 3)
    med = jnp.median(tiles.reshape(blocks, blocks, -1), axis=-1)
    mask_tiles = (tiles > (med[..., None, None] * edge_threshold)).astype(
        jnp.float32)
    mask = mask_tiles.transpose(0, 2, 1, 3).reshape(bh * blocks, bw * blocks)
    out = jnp.zeros_like(intensity)
    return out.at[: bh * blocks, : bw * blocks].set(mask)


# ---------------------------------------------------------------------------
# tracking loss (slam_utils.py:47-87)
# ---------------------------------------------------------------------------

def tracking_loss_rgb(image: jax.Array, gt_image: jax.Array,
                      opacity: jax.Array, grad_mask: jax.Array,
                      exposure_a: jax.Array, exposure_b: jax.Array,
                      rgb_boundary_threshold: float,
                      uncertainty_pix: jax.Array | None = None) -> jax.Array:
    """Opacity-weighted masked L1, optionally down-weighted by uncertainty
    (weights 0.5/σ² floored at 0.1 -> 0)."""
    image_ab = jnp.exp(exposure_a) * image + exposure_b
    rgb_mask = (gt_image.sum(-1) > rgb_boundary_threshold).astype(jnp.float32)
    mask = (rgb_mask * grad_mask)[..., None]
    l1 = opacity[..., None] * jnp.abs(image_ab * mask - gt_image * mask)
    if uncertainty_pix is not None:
        w = 0.5 / (uncertainty_pix ** 2)
        w = jnp.where(w < 0.1, 0.0, w)
        l1 = l1 * w[..., None]
    return l1.mean()


# ---------------------------------------------------------------------------
# plain mapping loss (slam_utils.py:107-143)
# ---------------------------------------------------------------------------

def mapping_loss_rgbd(image: jax.Array, depth: jax.Array, gt_image: jax.Array,
                      gt_depth: jax.Array, exposure_a, exposure_b,
                      cfg_alpha: float, rgb_boundary_threshold: float,
                      use_ssim: bool, lambda_dssim: float,
                      initialization: bool = False) -> jax.Array:
    image_ab = image if initialization else (
        jnp.exp(exposure_a) * image + exposure_b)
    rgb_mask = (gt_image.sum(-1) > rgb_boundary_threshold)[..., None]
    l1_rgb = jnp.abs(image_ab * rgb_mask - gt_image * rgb_mask)
    if use_ssim:
        ssim_loss = 1.0 - ssim_ops.ssim(image_ab, gt_image)
        rgb_term = ((1.0 - lambda_dssim) * l1_rgb + lambda_dssim * ssim_loss)
    else:
        rgb_term = l1_rgb
    depth_mask = gt_depth > 0.01
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return cfg_alpha * rgb_term.mean() + (1 - cfg_alpha) * l1_depth.mean()


# ---------------------------------------------------------------------------
# uncertainty-aware mapping loss (mapping_utils.py:207-323, slam_utils 146-258)
# ---------------------------------------------------------------------------

def compute_bias_factor(x, s):
    """NeRF-on-the-go adaptive weighting (mapping_utils.py:45-57)."""
    return x / (1 + (1 - x) * (1 / s - 2))


class UncertaintyLossOut(NamedTuple):
    total: jax.Array
    uncer_loss: jax.Array     # patch-grid uncertainty objective (pre-mean)
    weights_pix: jax.Array    # per-pixel 0.5/σ² weights used on rgb
    l1_rgb: jax.Array
    l1_depth: jax.Array


def mapping_loss_uncertainty(
    rendered_img: jax.Array,    # (H, W, 3)
    rendered_depth: jax.Array,  # (H, W)
    gt_img: jax.Array,
    ref_depth: jax.Array,       # (H, W) mono/aligned depth
    uncertainty: jax.Array,     # (h', w') MLP output σ on the DINO grid
    opacity: jax.Array,         # (H, W)
    exposure_a, exposure_b,
    train_frac: float,
    ssim_frac: float,
    cfg: dict,                  # {"alpha","rgb_boundary_threshold","ssim_loss",
                                #  "lambda_dssim"} + uncertainty_params dict
    initialization: bool = False,
    freeze_uncertainty_loss: bool = False,
    ref_depth_median: jax.Array | None = None,
) -> UncertaintyLossOut:
    up = cfg["uncertainty_params"]
    alpha = cfg.get("alpha", 0.95)
    H, W = gt_img.shape[:2]

    img_ab = rendered_img if initialization else (
        jnp.exp(exposure_a) * rendered_img + exposure_b)

    rgb_mask = (gt_img.sum(-1) > cfg["rgb_boundary_threshold"])[..., None]
    l1_rgb = jnp.abs(img_ab * rgb_mask - gt_img * rgb_mask)

    # ref_depth is constant per view within an optimization segment, and a
    # full-image jnp.median lowers to an H*W sort (~2.5 ms at 384x512 on
    # v5e) — hot callers precompute per-view medians once per segment and
    # pass them in (slam/mapper.py _opt_segment).
    med = (jnp.median(ref_depth) if ref_depth_median is None
           else ref_depth_median)
    depth_threshold = jnp.minimum(10 * med, 50.0)
    depth_mask = (ref_depth > 0.01) & (ref_depth < depth_threshold)
    l1_depth = jnp.abs(rendered_depth * depth_mask - ref_depth * depth_mask)

    # uncertainty processing (mapping_utils.py:265-272)
    proc_unc = jnp.clip(uncertainty, 0.1, None) + 1e-3
    resized_unc = ssim_ops.resample_bilinear(
        jax.lax.stop_gradient(proc_unc), (H, W))
    data_rate = 1 + 1 * compute_bias_factor(train_frac, 0.8)
    resized_unc = (resized_unc - 0.1) * data_rate + 0.1

    op_det = jax.lax.stop_gradient(opacity)
    small_opacity = ssim_ops.resample_bilinear(op_det, uncertainty.shape)

    # decomposed-SSIM uncertainty objective (mapping_utils.py:278-321)
    ssim_weight = 100 + 900 * compute_bias_factor(ssim_frac, 0.8)
    lum, con, struc = ssim_ops.ssim_components(
        gt_img, img_ab, window_size=up["ssim_window_size"])
    ssim_loss_map = jnp.clip(
        op_det * ssim_weight * (1 - lum) * (1 - struc) * (1 - con), None, 5.0)

    small_ssim = ssim_ops.resample_bilinear(
        jax.lax.stop_gradient(ssim_loss_map), uncertainty.shape)
    filtered_ssim = ssim_ops.median_pool2d(
        small_ssim, up["ssim_median_filter_size"])

    small_depth_loss = ssim_ops.resample_bicubic(
        jax.lax.stop_gradient(jnp.clip(l1_depth, None, DEPTH_MAX_CLIP)),
        uncertainty.shape)
    small_depth = ssim_ops.resample_bicubic(
        jax.lax.stop_gradient(ref_depth), uncertainty.shape)
    small_depth_loss = jnp.where(small_depth > depth_threshold, 0.0,
                                 small_depth_loss)

    uncer_loss = (
        filtered_ssim / proc_unc ** 2
        + 0.5 * jnp.log(proc_unc)
        + up["uncer_depth_mult"] * small_depth_loss / proc_unc ** 2
    )
    uncer_loss = jnp.where(
        small_opacity < up["opacity_th_for_uncer_loss"], 0.0, uncer_loss)
    if freeze_uncertainty_loss:
        uncer_loss = jax.lax.stop_gradient(uncer_loss)

    # rgb term with uncertainty weights (slam_utils.py:221-246)
    if cfg.get("ssim_loss", False):
        ssim_term = 1.0 - ssim_ops.ssim(img_ab, gt_img)
        rgb_loss = ((1.0 - cfg["lambda_dssim"]) * l1_rgb
                    + cfg["lambda_dssim"] * ssim_term)
    else:
        rgb_loss = l1_rgb

    weights = 0.5 / resized_unc ** 2
    weights = jnp.where(weights < 0.1, 0.0, weights)
    rgb_loss = weights[..., None] * rgb_loss

    # only down-weight depth where the distractor is in front (slam_utils 242-246)
    uncer_depth_mask = ref_depth < jax.lax.stop_gradient(rendered_depth) + 1.0
    l1_depth_w = jnp.where(uncer_depth_mask, weights * l1_depth, l1_depth)

    total = (alpha * rgb_loss.mean()
             + (1 - alpha) * l1_depth_w.mean()
             + up["ssim_mult"] * uncer_loss.mean())
    return UncertaintyLossOut(total, uncer_loss, weights, l1_rgb, l1_depth)


# ---------------------------------------------------------------------------
# DINO feature-similarity regularization (mapping_utils.py:332-388)
# ---------------------------------------------------------------------------

def dino_regularization_loss(uncertainties: jax.Array,
                             features: jax.Array,
                             top_k: int = 128,
                             sim_threshold: float = 0.75) -> jax.Array:
    """Variance of σ among top-k cosine-similar DINO features.

    uncertainties: (..., ) flattened to (P,); features (..., D) -> (P, D).
    """
    u = uncertainties.reshape(-1, 1)
    f = features.reshape(-1, features.shape[-1])
    f = f / jnp.clip(jnp.linalg.norm(f, axis=-1, keepdims=True), EPSILON, None)
    sim = f @ f.T
    k = min(top_k, sim.shape[-1])
    top_sim, top_idx = jax.lax.top_k(sim, k)
    mask = (top_sim > sim_threshold).astype(jnp.float32)
    neigh = u[top_idx, 0] * mask                      # (P, k)
    counts = mask.sum(-1, keepdims=True) + EPSILON
    means = neigh.sum(-1, keepdims=True) / counts
    var = (((neigh - means) ** 2) * mask).sum(-1, keepdims=True) / counts
    return var.mean()


def isotropic_loss(scaling: jax.Array, alive: jax.Array) -> jax.Array:
    """|s - mean(s)| per Gaussian (mapper.py:1166-1168), dead slots masked."""
    dev = jnp.abs(scaling - scaling.mean(axis=1, keepdims=True))
    dev = dev * alive[:, None]
    denom = jnp.maximum(alive.sum() * scaling.shape[1], 1)
    return dev.sum() / denom
