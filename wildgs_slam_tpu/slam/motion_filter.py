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


@partial(jax.jit, donate_argnums=(1,))
def _fused_step(params, store, fmap_last, net_last, inp_last, image, meta):
    """ONE device program for the whole per-frame motion-filter decision
    (ImageNet normalize -> fnet -> corr -> GRU flow -> keyframe decision ->
    masked store commit, with cnet only on the keyframe branch). The
    reference runs this as 4+ separate GPU launches + host sync
    (motion_filter.py:52-114); on the tunneled TPU the overheads are
    brutal — measured per frame at 384x512 (scripts in /tmp, r5): eager
    normalize ops on the fresh image ~136 ms, four separate scalar uploads
    ~34 ms, one fresh-value pull ~25 ms, the actual fnet+cnet+GRU compute
    ~4 ms. So: the image goes up RAW in one transfer, every scalar rides
    one packed meta array, all math lives in this single program, and the
    host pulls ONE scalar (is_kf).

    meta: float32[5] = (tstamp, index, have_prev, force, thresh).
    Returns (store', gmap, net, inp, is_kf, flow). net/inp are the last
    keyframe's context features (unchanged when not a keyframe); the store
    is donated and committed only under the keyframe mask."""
    tstamp = meta[0]
    index = meta[1].astype(jnp.int32)
    have_prev = meta[2] > 0
    force = meta[3] > 0
    thresh = meta[4]
    img_norm = normalize_image(image)
    dt = droid_net.net_dtype()
    gmap = droid_net.BasicEncoder(128, "instance", dtype=dt).apply(
        {"params": params["fnet"]}, img_norm[None])[0]

    h, w, _ = gmap.shape
    pyr = correlation.corr_pyramid(fmap_last[None], gmap[None])
    coords0 = projective.coords_grid(h, w)[None]
    corr = correlation.corr_lookup(pyr, coords0)
    flow0 = jnp.zeros((1, h, w, 4))
    _, delta, _, _, _ = droid_net.UpdateModule(dtype=dt).apply(
        {"params": params["update"]}, net_last[None], inp_last[None], corr,
        flow0, jnp.zeros((1,), jnp.int32), 1)
    flow = jnp.linalg.norm(delta.astype(jnp.float32), axis=-1).mean()
    is_kf = jnp.where(have_prev, (flow > thresh) | force, True)

    def kf_branch(store):
        ctx = droid_net.BasicEncoder(256, "none", dtype=dt).apply(
            {"params": params["cnet"]}, img_norm[None])[0]
        net, inp = droid_net.context_split(ctx)
        # context_split is f32 (tanh/relu outside the bf16 module); keep the
        # cond carry dtype equal to the bf16 last-keyframe features — the
        # GRU casts its inputs to the module dtype anyway
        net = net.astype(net_last.dtype)
        inp = inp.astype(inp_last.dtype)
        first = ~have_prev
        store = store._replace(
            timestamp=store.timestamp.at[index].set(tstamp),
            poses=jnp.where(first, store.poses.at[index].set(
                jnp.array([0, 0, 0, 0, 0, 0, 1.0])), store.poses),
            disps=jnp.where(first, store.disps.at[index].set(1.0),
                            store.disps),
            fmaps=store.fmaps.at[index].set(gmap),
            nets=store.nets.at[index].set(net),
            inps=store.inps.at[index].set(inp))
        return store, net, inp

    def skip_branch(store):
        return store, net_last, inp_last

    store, net, inp = jax.lax.cond(is_kf, kf_branch, skip_branch, store)
    return store, gmap, net, inp, is_kf, flow


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
        import os as _os

        self.fused = _os.environ.get("WILDGS_MF_FUSED", "1") != "0"
        self.count = 0
        # last-keyframe features
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image) -> bool:
        """image (H, W, 3) float in [0,1]. Returns force_to_add flag.

        Fused path (default): ONE device dispatch + ONE scalar pull per
        frame (_fused_step). WILDGS_MF_FUSED=0 selects the legacy
        multi-dispatch path (A/B: scripts/microbench_motion_filter.py)."""
        if not self.fused:
            return self._track_legacy(tstamp, image)
        state = self.state
        force = False
        have_prev = state.counter > 0
        if self.force_every > 0 and have_prev:
            last_t = state.timestamps[state.counter - 1]
            force = (tstamp - last_t) >= self.force_every

        idx = state.counter
        if self.fmap is None:
            h, w = state.store.fmaps.shape[1:3]
            dt = droid_net.net_dtype()
            self.fmap = jnp.zeros((h, w, 128), dt)
            self.net = jnp.zeros((h, w, 128), dt)
            self.inp = jnp.zeros((h, w, 128), dt)

        with TIMER.phase("track.mf.fused"):
            # two H2D transfers (raw image + packed meta), one dispatch,
            # one scalar pull — nothing eager (see _fused_step docstring)
            img = jnp.asarray(np.ascontiguousarray(image, np.float32))
            meta = jnp.asarray(np.array(
                [tstamp, idx, float(have_prev), float(bool(force)),
                 self.thresh], np.float32))
            (state.store, gmap, net, inp, is_kf, _flow) = _fused_step(
                self.params, state.store, self.fmap, self.net, self.inp,
                img, meta)
            kf = bool(is_kf)

        if kf:
            self.count = 0
            self.fmap, self.net, self.inp = gmap, net, inp
            with TIMER.phase("track.mf.priors"):
                depth = (self.depth_fn(image)
                         if self.depth_fn is not None else None)
                dino = self.feat_fn(image) if self.feat_fn is not None else None
            if depth is not None:
                with TIMER.phase("track.mf.append"):
                    state.store = kstore.append(
                        state.store, idx, tstamp,
                        mono_depth_up=jnp.asarray(depth))
            state.append_host(idx, image, dino, tstamp)
        else:
            self.count += 1
        return force

    def _track_legacy(self, tstamp, image) -> bool:
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
