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
               block: int = 512, precision=None) -> jax.Array:
    """Prefix sum along `axis` via (blocked) triangular matmul.

    precision defaults to HIGHEST (6-pass fp32 MXU) — required when x has
    full fp32 mantissas (the log-transmittance chains). For 0/1 MASK inputs
    pass x as bfloat16 with precision=DEFAULT: the operands are bf16-exact
    and accumulation is f32, so integer counts come out exact at 1/6 the
    MXU passes (the binning compactions use this)."""
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    x = jnp.moveaxis(x, axis, -1)
    *lead, K = x.shape
    ldt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if K <= block:
        L = jnp.asarray(_lower_tri(K, inclusive)).astype(ldt)
        out = jnp.einsum("kj,...j->...k", L, x,
                         preferred_element_type=jnp.float32,
                         precision=precision)
    else:
        nb = -(-K // block)
        pad = nb * block - K
        xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
        xb = xp.reshape(*lead, nb, block)
        L = jnp.asarray(_lower_tri(block, inclusive)).astype(ldt)
        within = jnp.einsum("kj,...bj->...bk", L, xb,
                            preferred_element_type=jnp.float32,
                            precision=precision)
        block_sums = xb.astype(jnp.float32).sum(-1)
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
