"""Frontend: local sliding-window BA driver (port of src/frontend.py).

Initialization (warmup keyframes -> neighborhood + proximity factors, 8+8
updates), per-keyframe update (edge aging, proximity proposal, iters1+iters2
updates, flow-based keyframe culling, optional loop closure via the
backend), and the second-stage re-initialization once the uncertainty MLP
has been trained (frontend.py:99-175).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import keyframe_store as kstore
from ..utils.profiling import TIMER
from .factor_graph import FactorGraph


class Frontend:
    def __init__(self, state, params, cfg, backend=None,
                 uncertainty_update_fn=None, mesh=None):
        self.state = state
        self.params = params
        self.cfg = cfg
        t = cfg["tracking"]
        self.max_age = t["max_age"]
        self.iters1 = 8
        self.iters2 = 4
        self.warmup = t["warmup"]
        self.beta = t["beta"]
        self.frontend_nms = t["frontend"]["nms"]
        self.keyframe_thresh = t["frontend"]["keyframe_thresh"]
        self.frontend_window = t["frontend"]["window"]
        self.frontend_thresh = t["frontend"]["thresh"]
        self.frontend_radius = t["frontend"]["radius"]
        self.frontend_max_factors = t["frontend"]["max_factors"]
        self.enable_loop = t["frontend"]["enable_loop"]
        # convergence early-exit threshold for batched graph updates (mean
        # |GRU delta| in px at 1/8 res; 0 = reference's fixed iteration
        # schedule). TPU-side speed knob — not in the reference config.
        self.update_eps = float(t["frontend"].get("update_eps", 0.0))
        self.multiview_thresh = t["multiview_filter"]["thresh"]
        self.multiview_visible_num = t["multiview_filter"]["visible_num"]

        self.backend = backend  # Backend instance for loop closure
        self.uncertainty_update_fn = uncertainty_update_fn  # () -> None

        self.graph = FactorGraph(state, params, corr_impl="volume",
                                 max_factors=self.frontend_max_factors,
                                 mesh=mesh)
        self.t1 = 0
        self.is_initialized = False
        self.max_consecutive_drop = (self.max_age / self.iters1) // 3
        self.num_keyframes_dropped = 0

    # ------------------------------------------------------------------

    def _prep_next_slot(self):
        """poses[t1] = poses[t1-1]; disps[t1] = mean (frontend.py:92-93)."""
        store = self.state.store
        poses = store.poses.at[self.t1].set(store.poses[self.t1 - 1])
        disps = store.disps.at[self.t1].set(store.disps[self.t1 - 1].mean())
        self.state.store = store._replace(poses=poses, disps=disps)

    def _filter_mono_depth(self, idx):
        """Cross-view mono depth filtering hook (frontend.py:64-66 ->
        depth_video.filter_high_err_mono_depth)."""
        nb = self.cfg["tracking"]["nb_ref_frame_metric_depth_filtering"]
        jj = self.graph.jj[self.graph.ii == idx]
        refs = list(dict.fromkeys(int(j) for j in jj))[:nb]
        for j in range(idx - 1, max(-1, idx - nb - 1), -1):
            if len(refs) >= nb:
                break
            if j >= 0 and j not in refs:
                refs.append(j)
        if not refs:
            return
        ht, wd = self.state.images.shape[1:3]

        def up(f):
            return jax.image.resize(jnp.asarray(f), (ht, wd, f.shape[-1]),
                                    "bilinear")

        feats_idx = up(self.state.dino_feats[idx])
        feats_refs = jnp.stack([up(self.state.dino_feats[j]) for j in refs])
        self.state.store = kstore.filter_high_err_mono_depth(
            self.state.store, idx, refs, feats_idx, feats_refs)

    def _update_depth_masks(self, frames=None):
        """`frames`: the dirty window (reference set_dirty(graph.ii.min(),
        t1) + dirty-gated update_valid_depth_mask, frontend.py:96,167,174 —
        only BA-touched frames are re-filtered)."""
        with TIMER.phase("track.fe.depth_masks"):
            self.state.store = kstore.update_valid_depth_mask(
                self.state.store, self.state.counter, self.multiview_thresh,
                self.multiview_visible_num, frames=frames)

    def __update(self, force_to_add_keyframe):
        """frontend.py:51-97."""
        self.t1 += 1
        if self.graph.corr_pyr is not None:
            with TIMER.phase("track.fe.rm_factors"):
                self.graph.rm_factors(self.graph.age > self.max_age,
                                      store=True)

        with TIMER.phase("track.fe.add_proximity"):
            self.graph.add_proximity_factors(
                self.t1 - 5, max(self.t1 - self.frontend_window, 0),
                rad=self.frontend_radius, nms=self.frontend_nms,
                thresh=self.frontend_thresh, beta=self.beta, remove=True)

        # iters1 graph updates, batched into at most two scanned dispatches
        # (split only where the mono-depth filter must observe intermediate
        # state, reference frontend.py:59-66); convergence early-exit via
        # update_eps (0 = reference's fixed schedule)
        run_mono_filter = (not self.cfg.get("fast_mode", False)
                           and self.state.metric_depth_reg
                           and self.state.uncertainty_aware)
        first = min(2, self.iters1) if run_mono_filter else self.iters1
        with TIMER.phase("track.fe.graph_update"):
            self.graph.update_n(first, None, None, use_inactive=True,
                                eps=self.update_eps)
        if run_mono_filter:
            with TIMER.phase("track.fe.mono_filter"):
                self._filter_mono_depth(self.t1 - 1)
            if self.iters1 > first:
                with TIMER.phase("track.fe.graph_update"):
                    self.graph.update_n(self.iters1 - first, None, None,
                                        use_inactive=True,
                                        eps=self.update_eps)

        with TIMER.phase("track.fe.kf_decision"):
            d = kstore.distance(self.state.store, self.state.counter,
                                jnp.array([self.t1 - 2]),
                                jnp.array([self.t1 - 1]),
                                beta=self.beta)
            drop = (float(d[0]) < self.keyframe_thresh
                    and self.num_keyframes_dropped < self.max_consecutive_drop
                    and not force_to_add_keyframe)
        if drop:
            with TIMER.phase("track.fe.rm_keyframe"):
                self.graph.rm_keyframe(self.t1 - 1)
                self.state.remove_keyframe_host(self.t1 - 1)
            self.num_keyframes_dropped += 1
            self.state.counter -= 1
            self.t1 -= 1
        else:
            cur_t = self.state.counter
            self.num_keyframes_dropped = 0
            ran_loop = False
            if (self.enable_loop and cur_t > self.frontend_window
                    and self.backend is not None):
                with TIMER.phase("track.fe.loop_ba"):
                    _, n_edge = self.backend.loop_ba(
                        t_start=0, t_end=cur_t, steps=self.iters2,
                        motion_only=False, local_graph=self.graph)
                ran_loop = n_edge > 0
            if not ran_loop:
                with TIMER.phase("track.fe.graph_update"):
                    self.graph.update_n(self.iters2, None, None,
                                        use_inactive=True,
                                        eps=self.update_eps)

        with TIMER.phase("track.fe.prep_next"):
            self._prep_next_slot()

    def __initialize(self):
        """frontend.py:99-128."""
        self.t1 = self.state.counter
        self.graph.add_neighborhood_factors(0, self.t1, r=3)
        self.graph.update_n(8, 1, use_inactive=True, eps=self.update_eps)
        self.graph.add_proximity_factors(0, 0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        self.graph.update_n(8, 1, use_inactive=True, eps=self.update_eps)
        self._prep_next_slot_init()
        self.is_initialized = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)

    def _prep_next_slot_init(self):
        store = self.state.store
        poses = store.poses.at[self.t1].set(store.poses[self.t1 - 1])
        disps = store.disps.at[self.t1].set(
            store.disps[self.t1 - 4:self.t1].mean())
        self.state.store = store._replace(poses=poses, disps=disps)

    def initialize_second_stage(self):
        """frontend.py:130-159 (after first uncertainty training)."""
        self.t1 = self.state.counter
        if self.uncertainty_update_fn is not None:
            self.uncertainty_update_fn()
        self.graph.add_proximity_factors(0, 0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        self.graph.update_n(8, 1, use_inactive=True, eps=self.update_eps)
        self.graph.age = np.maximum(self.graph.age - 8, 0)
        self._prep_next_slot_init()
        self.is_initialized = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)
        # the 8 updates moved every frame: full-range mask refresh
        # (reference set_dirty(0, t1), frontend.py:157)
        self._update_depth_masks()

    def __call__(self, force_to_add_keyframe=False):
        if not self.is_initialized and self.state.counter == self.warmup:
            self.__initialize()
            self._update_depth_masks()
        elif self.is_initialized and self.t1 < self.state.counter:
            if self.uncertainty_update_fn is not None:
                with TIMER.phase("track.fe.uncer_update"):
                    self.uncertainty_update_fn()
            self.__update(force_to_add_keyframe)
            lo = int(self.graph.ii.min()) if len(self.graph.ii) else 0
            self._update_depth_masks(frames=np.arange(lo, self.t1))
