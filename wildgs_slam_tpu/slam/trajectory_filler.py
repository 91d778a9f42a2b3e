"""PoseTrajectoryFiller: recover non-keyframe poses after tracking.

Port of src/trajectory_filler.py:10-139. For each batch of 16 frames:
linear SE3 interpolation between bracketing keyframes initializes the pose,
frames are temporarily appended to the KeyframeStore (fnet features only),
edges connect each frame to its two bracketing keyframes, and 12 motion-only
DBA updates refine the poses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie
from . import keyframe_store as kstore
from .factor_graph import FactorGraph
from .motion_filter import _encode_fmap, normalize_image


class PoseTrajectoryFiller:
    def __init__(self, state, params, feat_fn=None, uncer_apply=None,
                 train_frac_fix=0.3):
        self.state = state
        self.params = params
        self.feat_fn = feat_fn
        self.uncer_apply = uncer_apply
        self.train_frac_fix = train_frac_fix
        # per-frame DINO features of the last __call__, in stream order
        # (reference traj_filler returns dino_feats so full_traj_eval's
        # pose refinement reuses them, eval_traj.py:144-155)
        self.last_features = None

    def _interpolate(self, timestamps):
        """Linear SE3 interpolation between bracketing keyframes
        (trajectory_filler.py:61-70). Returns (t0, (M, 7) poses)."""
        state = self.state
        store = state.store
        N = state.counter
        ts = np.asarray(state.timestamps[:N])
        tt = np.asarray(timestamps)

        t0 = np.array([max(0, int((ts <= t).sum()) - 1) for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        Ps = store.poses
        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3)
        dP = lie.se3_mul(Ps[jnp.asarray(t1)], lie.se3_inv(Ps[jnp.asarray(t0)]))
        v = lie.se3_log(dP) / dt[:, None]
        w = v * jnp.asarray(tt - ts[t0])[:, None]
        Gs = lie.se3_mul(lie.se3_exp(w), Ps[jnp.asarray(t0)])
        return t0, t1, Gs

    def _fill(self, timestamps, images):
        state = self.state
        store = state.store
        N = state.counter
        M = len(timestamps)
        B = store.poses.shape[0]

        t0, t1, Gs = self._interpolate(timestamps)
        if N + M > B:
            # buffer full (every frame became a keyframe): no scratch slots
            # for motion-only BA — interpolation alone is exact there anyway
            if self.last_features is not None:
                self.last_features.extend([None] * M)  # keep frame alignment
            return np.asarray(Gs)

        # append temporarily with fnet features
        for m in range(M):
            img = jnp.asarray(images[m])
            fmap = _encode_fmap(self.params, normalize_image(img))
            store = kstore.append(
                store, N + m, timestamps[m], pose=Gs[m],
                disp=jnp.ones_like(store.disps[0]), fmap=fmap)
        state.store = store
        state.counter = N + M

        if self.uncer_apply is not None and self.feat_fn is not None:
            feats_np = [np.asarray(self.feat_fn(images[m]))
                        for m in range(M)]
            if self.last_features is not None:
                self.last_features.extend(feats_np)
            feats = jnp.asarray(np.stack(feats_np))
            state.store = kstore.update_uncertainties(
                state.store, self.uncer_apply, feats,
                jnp.arange(N, N + M), self.train_frac_fix)

        graph = FactorGraph(state, self.params, corr_impl="volume",
                            max_factors=-1, pmax=max(64, 2 * M))
        new_ids = np.arange(N, N + M)
        graph.add_factors(t0, new_ids)
        graph.add_factors(t1, new_ids)
        for _ in range(12):
            graph.update(N, N + M, motion_only=True)

        poses_out = np.asarray(state.store.poses[N:N + M])
        state.counter = N  # restore
        return poses_out

    def __call__(self, image_stream, stride=1, batch=16):
        """Returns (M, 7) w2c poses for every frame of the stream."""
        self.last_features = ([] if (self.uncer_apply is not None
                                     and self.feat_fn is not None) else None)
        spare = self.state.store.poses.shape[0] - self.state.counter
        if spare >= 1:
            batch = min(batch, spare)
        poses = []
        timestamps, images = [], []
        for i in range(0, len(image_stream), stride):
            index, color, _, _ = image_stream[i]
            timestamps.append(float(index))
            images.append(color)
            if len(timestamps) == batch:
                poses.append(self._fill(timestamps, images))
                timestamps, images = [], []
        if timestamps:
            poses.append(self._fill(timestamps, images))
        return np.concatenate(poses, axis=0)
