"""Brute-force 3-NN mean squared distance (replaces simple-knn's distCUDA2).

The reference calls `simple_knn._C.distCUDA2(points)` once per keyframe batch
to initialize Gaussian scales (gaussian_model.py:201-210); batches are a few
thousand points, so an exact (M, M) distance matrix + top-k on the MXU is
both simpler and faster than a spatial grid on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_dist2(points: jax.Array, valid: jax.Array | None = None,
              k: int = 3) -> jax.Array:
    """Mean squared distance of each point to its k nearest neighbors.

    Args:
      points: (M, 3).
      valid: optional (M,) bool; invalid points are excluded as neighbors and
        get dist 0.
    Returns: (M,) float32.
    """
    M = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * points @ points.T  # (M, M)
    d2 = jnp.maximum(d2, 0.0)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    eye = jnp.eye(M, dtype=bool)
    d2 = jnp.where(eye, big, d2)
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, big)
    # k smallest via top_k on negated distances
    neg_topk, _ = jax.lax.top_k(-d2, k)
    mean_d2 = jnp.mean(-neg_topk, axis=-1)
    if valid is not None:
        mean_d2 = jnp.where(valid, mean_d2, 0.0)
    return mean_d2
