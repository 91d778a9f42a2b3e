"""SlamState: single-controller shared state.

Replaces the reference's shared-memory DepthVideo + mp.Value counter +
locks (slam.py:47-63): one host object owns the device KeyframeStore pytree
and the host-side payloads (full-res images, DINO features); the tracker and
mapper run as ordinary function calls in one process, so plain attribute
mutation is already ordered.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from . import keyframe_store as kstore


@dataclass
class SlamState:
    store: Any                      # KeyframeStore pytree (device)
    counter: int = 0                # keyframe count (DepthVideo.counter)
    images: Optional[np.ndarray] = None       # (B, H, W, 3) host uint8/f32
    dino_feats: Optional[np.ndarray] = None   # (B, h14, w14, 384) host
    timestamps: Optional[np.ndarray] = None   # host copy for bookkeeping
    metric_depth_reg: bool = True
    uncertainty_aware: bool = True
    cfg: dict = field(default_factory=dict)
    # bumped whenever host-side per-frame arrays shift (keyframe removal) so
    # device-side mirrors (system.py dino cache) know to refresh
    host_gen: int = 0

    @classmethod
    def create(cls, cfg, ht, wd, intrinsics_full, buffer=350,
               uncertainty_aware=True, metric_depth_reg=True,
               feature_dim=384):
        store = kstore.create(buffer, ht, wd, intrinsics_full)
        images = np.zeros((buffer, ht, wd, 3), np.float32)
        dino = np.zeros((buffer, ht // 14, wd // 14, feature_dim),
                        np.float32) if uncertainty_aware else None
        return cls(store=store, counter=0, images=images, dino_feats=dino,
                   timestamps=np.zeros(buffer), cfg=cfg,
                   metric_depth_reg=metric_depth_reg,
                   uncertainty_aware=uncertainty_aware)

    def append_host(self, index, image, dino=None, timestamp=0.0):
        self.images[index] = np.asarray(image)
        if dino is not None and self.dino_feats is not None:
            self.dino_feats[index] = np.asarray(dino)
        self.timestamps[index] = timestamp
        self.counter = max(self.counter, index + 1)

    def remove_keyframe_host(self, ix):
        self.host_gen += 1
        self.images[ix:-1] = self.images[ix + 1:]
        if self.dino_feats is not None:
            self.dino_feats[ix:-1] = self.dino_feats[ix + 1:]
        self.timestamps[ix:-1] = self.timestamps[ix + 1:]
