"""MXU-friendly prefix operations.

XLA lowers jnp.cumsum/cumprod on TPU to log-depth reduce-windows or
sequential loops — slow for the rasterizer's per-chunk transmittance chains
and the binning compaction. A prefix sum along an axis of length K is just a
multiplication by a lower-triangular ones matrix, which the MXU does in one
pass; cumprod goes through log space (inputs here are (1 - alpha) in
(0.01, 1], so logs are well-behaved).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lower_tri(k: int, inclusive: bool) -> np.ndarray:
    m = np.tril(np.ones((k, k), np.float32), 0 if inclusive else -1)
    return m


def cumsum_mxu(x: jax.Array, axis: int, inclusive: bool = True,
               block: int = 512) -> jax.Array:
    """Prefix sum along `axis` via (blocked) triangular matmul."""
    x = jnp.moveaxis(x, axis, -1)
    *lead, K = x.shape
    if K <= block:
        L = jnp.asarray(_lower_tri(K, inclusive))
        out = jnp.einsum("kj,...j->...k", L, x,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        nb = -(-K // block)
        pad = nb * block - K
        xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
        xb = xp.reshape(*lead, nb, block)
        L = jnp.asarray(_lower_tri(block, inclusive))
        within = jnp.einsum("kj,...bj->...bk", L, xb,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        block_sums = xb.sum(-1)
        offsets = jnp.cumsum(block_sums, axis=-1) - block_sums  # (..., nb)
        out = (within + offsets[..., None]).reshape(*lead, nb * block)[..., :K]
    return jnp.moveaxis(out, -1, axis)


def cumprod_pos_mxu(x: jax.Array, axis: int, inclusive: bool = True,
                    eps: float = 1e-12) -> jax.Array:
    """Prefix product along `axis` for STRICTLY POSITIVE x, via exp/log +
    matmul prefix sum. Used for transmittance chains where x = 1 - alpha
    with alpha <= 0.99."""
    lg = jnp.log(jnp.maximum(x, eps))
    return jnp.exp(cumsum_mxu(lg, axis, inclusive))
