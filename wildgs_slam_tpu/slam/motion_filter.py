"""Motion filter: keyframe selection by approximate flow magnitude.

Port of src/motion_filter.py:10-119. Every incoming frame is encoded with
fnet; a single GRU update against the last keyframe estimates mean flow; a
frame becomes a keyframe if flow > thresh (2.5-3.0 px at 1/8 res) or if
forced every `force_keyframe_every_n_frames` frames. Keyframes additionally
get context features, a metric mono-depth prior and DINO features.

The depth/feature predictors are injected callables (`depth_fn`,
`feat_fn`) — the heavy prior networks live in models/ and are optional.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import droid_net
from ..ops import correlation, projective
from ..utils.profiling import TIMER
from . import keyframe_store as kstore

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_image(image: jax.Array) -> jax.Array:
    """(H, W, 3) in [0,1] -> ImageNet-normalized."""
    return (image - IMAGENET_MEAN) / IMAGENET_STD


@jax.jit
def _encode_all(params, image_norm):
    """fnet + cnet on one frame: returns (fmap, net, inp), (h, w, C)."""
    x = image_norm[None]
    fmap = droid_net.BasicEncoder(128, "instance", dtype=droid_net.net_dtype()).apply(
        {"params": params["fnet"]}, x)[0]
    ctx = droid_net.BasicEncoder(256, "none", dtype=droid_net.net_dtype()).apply(
        {"params": params["cnet"]}, x)[0]
    net, inp = droid_net.context_split(ctx)
    return fmap, net, inp


@jax.jit
def _encode_fmap(params, image_norm):
    return droid_net.BasicEncoder(128, "instance", dtype=droid_net.net_dtype()).apply(
        {"params": params["fnet"]}, image_norm[None])[0]


@jax.jit
def _flow_magnitude(params, fmap_last, gmap, net, inp):
    """One GRU update at grid coords -> mean |delta| (motion_filter.py:83-97)."""
    h, w, _ = gmap.shape
    pyr = correlation.corr_pyramid(fmap_last[None], gmap[None])
    coords0 = projective.coords_grid(h, w)[None]
    corr = correlation.corr_lookup(pyr, coords0)
    flow = jnp.zeros((1, h, w, 4))
    _, delta, _, _, _ = droid_net.UpdateModule(dtype=droid_net.net_dtype()).apply(
        {"params": params["update"]}, net[None], inp[None], corr, flow,
        jnp.zeros((1,), jnp.int32), 1)
    return jnp.linalg.norm(delta, axis=-1).mean()


class MotionFilter:
    def __init__(self, state, params, thresh=2.5,
                 force_keyframe_every_n_frames=-1, depth_fn=None,
                 feat_fn=None):
        self.state = state
        self.params = params
        self.thresh = thresh
        self.force_every = force_keyframe_every_n_frames
        self.depth_fn = depth_fn    # image -> (H, W) metric depth or None
        self.feat_fn = feat_fn      # image -> (h14, w14, 384) or None
        self.count = 0
        # last-keyframe features
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image) -> bool:
        """image (H, W, 3) float in [0,1]. Returns force_to_add flag."""
        state = self.state
        with TIMER.phase("track.mf.encode_fmap"):
            img_norm = normalize_image(jnp.asarray(image))
            gmap = jax.block_until_ready(_encode_fmap(self.params, img_norm))

        force = False
        if state.counter == 0:
            self._append_keyframe(tstamp, image, img_norm, gmap,
                                  first=True)
            return False

        with TIMER.phase("track.mf.flow"):
            flow = float(_flow_magnitude(self.params, self.fmap, gmap,
                                         self.net, self.inp))
        if self.force_every > 0:
            last_t = state.timestamps[state.counter - 1]
            force = (tstamp - last_t) >= self.force_every

        if flow > self.thresh or force:
            self.count = 0
            self._append_keyframe(tstamp, image, img_norm, gmap, first=False)
        else:
            self.count += 1
        return force

    def _append_keyframe(self, tstamp, image, img_norm, gmap, first):
        state = self.state
        with TIMER.phase("track.mf.encode_ctx"):
            _, net, inp = _encode_all(self.params, img_norm)
        self.fmap, self.net, self.inp = gmap, net, inp

        with TIMER.phase("track.mf.priors"):
            depth = self.depth_fn(image) if self.depth_fn is not None else None
            dino = self.feat_fn(image) if self.feat_fn is not None else None

        idx = state.counter
        with TIMER.phase("track.mf.append"):
            state.store = kstore.append(
                state.store, idx, tstamp,
                pose=(jnp.array([0, 0, 0, 0, 0, 0, 1.0]) if first else None),
                disp=(jnp.ones_like(state.store.disps[0]) if first else None),
                mono_depth_up=(jnp.asarray(depth)
                               if depth is not None else None),
                fmap=gmap, net=net, inp=inp)
            state.append_host(idx, image, dino, tstamp)
