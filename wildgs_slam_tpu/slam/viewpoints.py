"""ViewpointStore: fixed-capacity per-keyframe camera/image state.

Functional replacement for the reference's dict of Camera objects
(src/utils/camera_utils.py Camera + mapper.py self.cameras): per-keyframe
ground-truth color, estimated depth, absolute w2c pose, DINO features,
learnable exposure (a, b) with its Adam state, and the Scharr gradient mask.
Stored as one pytree of capacity-B device arrays so the jitted mapping step
can gather any view by index.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie
from . import losses


class ViewpointStore(NamedTuple):
    w2c: jax.Array          # (B, 7) current absolute pose estimate
    colors: jax.Array       # (B, H, W, 3) bf16 ground-truth images
    depths: jax.Array       # (B, H, W) estimated/prior depth
    features: jax.Array     # (B, h14, w14, D) bf16 DINO features
    grad_mask: jax.Array    # (B, H, W) float 0/1
    exposure: jax.Array     # (B, 2) learnable (a, b)
    exposure_mu: jax.Array  # (B, 2) Adam m
    exposure_nu: jax.Array  # (B, 2) Adam v
    exposure_count: jax.Array  # (B,) per-view Adam step (reset per keyframe)
    valid: jax.Array        # (B,) bool is_kf
    # per-view median of `depths`, cached at write time: the uncertainty
    # mapping loss needs it every iteration and a full-image jnp.median is
    # an H*W device sort (~2.5 ms at 384x512 on v5e)
    depth_med: jax.Array    # (B,)


def create(capacity: int, ht: int, wd: int, feat_hw=(0, 0), feat_dim=384):
    fh, fw = feat_hw
    return ViewpointStore(
        w2c=jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1.0]), (capacity, 1)),
        colors=jnp.zeros((capacity, ht, wd, 3), jnp.bfloat16),
        depths=jnp.zeros((capacity, ht, wd)),
        features=jnp.zeros((capacity, fh, fw, feat_dim), jnp.bfloat16),
        grad_mask=jnp.zeros((capacity, ht, wd)),
        exposure=jnp.zeros((capacity, 2)),
        exposure_mu=jnp.zeros((capacity, 2)),
        exposure_nu=jnp.zeros((capacity, 2)),
        exposure_count=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        depth_med=jnp.zeros((capacity,)),
    )


@partial(jax.jit, static_argnames=("edge_threshold",))
def set_view(vs: ViewpointStore, idx, color, depth, w2c, features=None,
             edge_threshold: float = 4.0) -> ViewpointStore:
    """Create/overwrite viewpoint `idx` (Camera.init_from_dataset +
    compute_grad_mask, camera_utils.py:87-180)."""
    gmask = losses.compute_grad_mask(color, edge_threshold)
    upd = dict(
        w2c=vs.w2c.at[idx].set(w2c),
        colors=vs.colors.at[idx].set(color.astype(jnp.bfloat16)),
        depths=vs.depths.at[idx].set(depth),
        depth_med=vs.depth_med.at[idx].set(jnp.median(depth)),
        grad_mask=vs.grad_mask.at[idx].set(gmask),
        valid=vs.valid.at[idx].set(True),
    )
    if features is not None:
        upd["features"] = vs.features.at[idx].set(
            features.astype(jnp.bfloat16))
    return vs._replace(**upd)


def reset_exposure_adam(vs: ViewpointStore, idx) -> ViewpointStore:
    """Fresh exposure optimizer state (the reference rebuilds the keyframe
    Adam on every new keyframe, mapper.py:221-243)."""
    return vs._replace(
        exposure_mu=vs.exposure_mu.at[idx].set(0.0),
        exposure_nu=vs.exposure_nu.at[idx].set(0.0),
        exposure_count=vs.exposure_count.at[idx].set(0),
    )


def exposure_adam_step(vs: ViewpointStore, idx, grad, lr=0.01, b1=0.9,
                       b2=0.999, eps=1e-8) -> ViewpointStore:
    """Adam on view idx's (a, b) only (other views' grads are zero in the
    sampled-view loss, so stepping just this view matches torch up to the
    momentum decay of stale state)."""
    cnt = vs.exposure_count[idx] + 1
    mu = b1 * vs.exposure_mu[idx] + (1 - b1) * grad
    nu = b2 * vs.exposure_nu[idx] + (1 - b2) * grad * grad
    mu_hat = mu / (1 - b1 ** cnt.astype(jnp.float32))
    nu_hat = nu / (1 - b2 ** cnt.astype(jnp.float32))
    new = vs.exposure[idx] - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return vs._replace(
        exposure=vs.exposure.at[idx].set(new),
        exposure_mu=vs.exposure_mu.at[idx].set(mu),
        exposure_nu=vs.exposure_nu.at[idx].set(nu),
        exposure_count=vs.exposure_count.at[idx].set(cnt),
    )


def update_pose(vs: ViewpointStore, idx, w2c) -> ViewpointStore:
    return vs._replace(w2c=vs.w2c.at[idx].set(w2c))
