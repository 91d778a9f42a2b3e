"""Backend: global dense BA + loop closure (port of src/backend.py).

`dense_ba` builds a fresh full-window factor graph with on-the-fly
correlation and runs update_lowmem; `loop_ba` runs a windowed loop-closure
BA seeded with the frontend's local graph edges (backend.py:41-115).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.profiling import TIMER
from . import keyframe_store as kstore
from .factor_graph import FactorGraph


class Backend:
    def __init__(self, state, params, cfg, uncertainty_update_fn=None):
        self.state = state
        self.params = params
        self.cfg = cfg
        t = cfg["tracking"]
        self.beta = t["beta"]
        self.backend_thresh = t["backend"]["thresh"]
        self.backend_radius = t["backend"]["radius"]
        self.backend_nms = t["backend"]["nms"]
        self.backend_normalize = t["backend"]["normalize"]
        self.loop_window = t["backend"]["loop_window"]
        self.loop_thresh = t["backend"]["loop_thresh"]
        self.loop_radius = t["backend"]["loop_radius"]
        self.loop_nms = t["backend"]["loop_nms"]
        self.multiview_thresh = t["multiview_filter"]["thresh"]
        self.multiview_visible_num = t["multiview_filter"]["visible_num"]
        self.uncertainty_update_fn = uncertainty_update_fn
        # integrated-ATE oracle hook (see FactorGraph.gt_injection):
        # propagated to every graph this backend builds
        self.gt_injection = None

    def backend_ba(self, t_start, t_end, steps, graph, nms, radius, thresh,
                   max_factors, t_start_loop=None, loop=False):
        """backend.py:42-65."""
        if self.uncertainty_update_fn is not None:
            self.uncertainty_update_fn()
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        with TIMER.phase("track.lowmem.proposal"):
            edge_num = graph.add_backend_proximity_factors(
                t_start, t_end, nms, radius, thresh, max_factors, self.beta,
                t_start_loop, loop)
        if edge_num == 0:
            graph.clear_edges()
            return 0
        graph.update_lowmem(t0=t_start_loop + 1, t1=t_end, itrs=2,
                            steps=steps)
        graph.clear_edges()
        return edge_num

    def dense_ba(self, steps=6):
        """backend.py:67-87."""
        t_start, t_end = 0, self.state.counter
        n = t_end - t_start
        max_factors = (self.backend_radius + 2) * 2 * n
        if self.backend_normalize:
            self.state.store = kstore.normalize(self.state.store, t_end)
        with TIMER.phase("track.lowmem.graph_build"):
            graph = FactorGraph(self.state, self.params, corr_impl="alt",
                                max_factors=max_factors,
                                pmax=self.state.store.poses.shape[0])
        graph.gt_injection = self.gt_injection
        n_edges = self.backend_ba(t_start, t_end, steps, graph,
                                  self.backend_nms, self.backend_radius,
                                  self.backend_thresh, max_factors)
        with TIMER.phase("track.lowmem.depth_mask"):
            self.state.store = kstore.update_valid_depth_mask(
                self.state.store, self.state.counter, self.multiview_thresh,
                self.multiview_visible_num)
        return n, n_edges

    def loop_ba(self, t_start, t_end, steps=6, motion_only=False,
                local_graph=None):
        """backend.py:91-115."""
        max_factors = 8 * self.loop_window
        t_start_loop = max(0, t_end - self.loop_window)
        graph = FactorGraph(self.state, self.params, corr_impl="alt",
                            max_factors=max_factors,
                            pmax=self.state.store.poses.shape[0])
        graph.gt_injection = self.gt_injection
        if local_graph is not None:
            graph.adopt_edges(local_graph)
        left = max_factors - len(graph.ii)
        n_edges = self.backend_ba(t_start, t_end, steps, graph,
                                  self.loop_nms, self.loop_radius,
                                  self.loop_thresh, left,
                                  t_start_loop=t_start_loop, loop=True)
        return t_end - t_start_loop, n_edges
