"""Common utilities (port of src/utils/common.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def align_scale_and_shift(prediction, target, weights=None):
    """Weighted 2x2 least squares for depth scale/shift
    (common.py:56-93): min Σ w (s·pred + q - target)².

    prediction/target/weights: (H, W) or (B, H, W).
    Returns (scale, shift, avg_error), batched if input was batched.
    """
    prediction = jnp.asarray(prediction)
    squeeze = prediction.ndim < 3
    if squeeze:
        prediction = prediction[None]
        target = jnp.asarray(target)[None]
        weights = None if weights is None else jnp.asarray(weights)[None]
    if weights is None:
        weights = jnp.ones_like(prediction)

    a00 = jnp.sum(weights * prediction * prediction, axis=(1, 2))
    a01 = jnp.sum(weights * prediction, axis=(1, 2))
    a11 = jnp.sum(weights, axis=(1, 2))
    b0 = jnp.sum(weights * prediction * target, axis=(1, 2))
    b1 = jnp.sum(weights * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    scale = (a11 * b0 - a01 * b1) / det
    shift = (-a01 * b0 + a00 * b1) / det
    err = jnp.abs(scale[:, None, None] * prediction + shift[:, None, None]
                  - target)
    avg_error = jnp.sum(err * weights, axis=(1, 2)) / jnp.clip(
        jnp.sum(weights, axis=(1, 2)), 1e-8)
    if squeeze:
        return scale[0], shift[0], avg_error[0]
    return scale, shift, avg_error


def as_intrinsics_matrix(intrinsics):
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = intrinsics
    return K
