"""SSIM (standard + decomposed) and median pooling, pure JAX.

Ports the semantics of the reference's
thirdparty/gaussian_splatting/utils/loss_utils.py:61-101 (standard ssim) and
src/utils/dyn_uncertainty/mapping_utils.py:99-204 (clipped luminance /
contrast / structure decomposition from NeRF-on-the-go) plus
median_filter.py:9-53 (MedianPool2d). Images are (H, W, C) float32 — the
Gaussian window is separable so we use two 1-D depthwise convolutions, which
XLA fuses well on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)
SSIM_C1 = 0.01 ** 2
SSIM_C2 = 0.03 ** 2
SSIM_C3 = SSIM_C2 / 2
GAUSSIAN_SIGMA = 1.5
SSIM_MAX_CLIP = 0.98


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2)
    )
    return (g / g.sum()).astype(np.float32)


def _blur(img: jax.Array, window_size: int, sigma: float = GAUSSIAN_SIGMA):
    """Separable Gaussian blur of (H, W, C) with SAME zero padding (matches
    torch F.conv2d(padding=ws//2) used by the reference)."""
    k = jnp.asarray(_gaussian_kernel(window_size, sigma))
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, window_size, 1)
    kw = k.reshape(1, 1, 1, window_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = [(window_size // 2, window_size // 2), (0, 0)]
    pad_w = [(0, 0), (window_size // 2, window_size // 2)]
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), pad_h, dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), pad_w, dimension_numbers=dn)
    return jnp.moveaxis(x[:, 0], 0, -1)  # (H, W, C)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Standard SSIM, mean over pixels/channels. Images (H, W, C) in [0,1]."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + SSIM_C1) * (2 * sigma12 + SSIM_C2)) / (
        (mu1_sq + mu2_sq + SSIM_C1) * (sigma1_sq + sigma2_sq + SSIM_C2)
    )
    return ssim_map.mean()


def ssim_components(img1: jax.Array, img2: jax.Array, window_size: int = 11):
    """Clipped (luminance, contrast, structure), each (H, W), mean over C.

    Matches mapping_utils._ssim (incl. the eps floor on variances, the
    covariance magnitude clamp, and the 0.98 clips on contrast/structure).
    """
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = jnp.maximum(EPSILON, _blur(img1 * img1, window_size) - mu1_sq)
    sigma2_sq = jnp.maximum(EPSILON, _blur(img2 * img2, window_size) - mu2_sq)
    sigma12 = _blur(img1 * img2, window_size) - mu1_mu2
    sigma12 = jnp.sign(sigma12) * jnp.minimum(
        jnp.sqrt(sigma1_sq * sigma2_sq), jnp.abs(sigma12)
    )

    s1, s2 = jnp.sqrt(sigma1_sq), jnp.sqrt(sigma2_sq)
    luminance = (2 * mu1_mu2 + SSIM_C1) / (mu1_sq + mu2_sq + SSIM_C1)
    contrast = (2 * s1 * s2 + SSIM_C2) / (sigma1_sq + sigma2_sq + SSIM_C2)
    structure = (sigma12 + SSIM_C3) / (s1 * s2 + SSIM_C3)

    contrast = jnp.clip(contrast, None, SSIM_MAX_CLIP)
    structure = jnp.clip(structure, None, SSIM_MAX_CLIP)
    return luminance.mean(-1), contrast.mean(-1), structure.mean(-1)


def median_pool2d(x: jax.Array, kernel_size: int) -> jax.Array:
    """Median pooling with stride 1 and 'same' torch-style padding on (H, W).

    Matches MedianPool2d(same=True): asymmetric zero padding
    (pl, pr, pt, pb) = (k//2 floor/ceil split), unfold + median.
    """
    k = kernel_size
    pl = (k - 1) // 2
    pr = k - 1 - pl
    xp = jnp.pad(x, ((pl, pr), (pl, pr)))
    H, W = x.shape
    # extract k*k shifted views: (H, W, k*k)
    views = [xp[i : i + H, j : j + W] for i in range(k) for j in range(k)]
    stack = jnp.stack(views, axis=-1)
    return jnp.median(stack, axis=-1)


def resample_bilinear(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinear resize of (H, W) to `shape`, align_corners=False semantics
    (matches torch F.interpolate used in mapping_utils.py:10-31)."""
    return jax.image.resize(x, shape, method="bilinear")


def resample_bicubic(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    return jax.image.resize(x, shape, method="bicubic")
