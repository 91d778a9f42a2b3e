"""Mono priors: metric depth + DINO feature predictors with disk caching.

Port of src/utils/mono_priors/{metric_depth_estimators.py,
img_feature_extractors.py}: keyframes get (a) a metric monocular depth map
regularizing the DBA and (b) DINOv2 patch features driving the uncertainty
MLP; both are cached as .npy under <out>/mono_priors/{depths,features}.

Natively supported backbones (flax, weights converted from the published
torch checkpoints under ./pretrained):
  - depth: dpt2_{vits,vitb,vitl}_{hypersim,vkitti}_{20,80} (DepthAnythingV2
    metric models; the reference's default metric3d is torch-hub-only and is
    mapped onto the equivalent dpt2 model when its checkpoint is absent).
  - features: dinov2_vits14 / dinov2_vits14_reg (384-d patch features).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import dinov2 as dinov2_mod
from . import dpt as dpt_mod

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize_np(img, h, w):
    import cv2

    return cv2.resize(np.asarray(img), (w, h), interpolation=cv2.INTER_AREA)


class DepthAnythingPredictor:
    """Metric depth via DepthAnythingV2 (dpt2_* configs,
    metric_depth_estimators.py:38-71, 106-108)."""

    def __init__(self, depth_model: str, ckpt_dir="pretrained",
                 input_size=518):
        encoder, dataset, max_depth = depth_model.split("_")[1:4]
        self.encoder = encoder
        self.model = dpt_mod.DepthAnythingV2(encoder=encoder,
                                             max_depth=float(max_depth))
        path = os.path.join(
            ckpt_dir, f"depth_anything_v2_metric_{dataset}_{encoder}.pth")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        self.params = dpt_mod.load_torch_depth_anything(sd, encoder)
        self.input_size = input_size
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float [0,1] -> metric depth (H, W)."""
        import cv2

        H, W = image.shape[:2]
        # 14-aligned resize with the longer side ~ input_size (DA2's
        # image2tensor semantics)
        scale = self.input_size / min(H, W)
        nh = int(round(H * scale / 14)) * 14
        nw = int(round(W * scale / 14)) * 14
        x = _resize_np(image, nh, nw)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        depth = self._apply(self.params, jnp.asarray(x)[None])[0]
        depth = cv2.resize(np.asarray(depth), (W, H),
                           interpolation=cv2.INTER_CUBIC)
        return depth.astype(np.float32)


class DinoFeaturePredictor:
    """DINOv2 patch features (img_feature_extractors.py:85-178)."""

    def __init__(self, extractor: str = "dinov2_vits14",
                 ckpt_dir="pretrained"):
        n_reg = 4 if "reg" in extractor else 0
        self.model = dinov2_mod.make_dinov2("vits",
                                            num_register_tokens=n_reg)
        self.params = None
        for cand in (f"{extractor}.pth", "dinov2_vits14_reg4_pretrain.pth",
                     "dinov2_vits14_pretrain.pth"):
            path = os.path.join(ckpt_dir, cand)
            if os.path.exists(path):
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
                self.params = dinov2_mod.load_torch_dinov2(sd)
                break
        if self.params is None:
            raise FileNotFoundError(
                f"no dinov2 checkpoint for {extractor} in {ckpt_dir}")
        self._apply = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x)[0][0])

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float [0,1] -> features (H//14, W//14, 384)."""
        H, W = image.shape[:2]
        ph, pw = H // 14, W // 14
        x = _resize_np(image, ph * 14, pw * 14)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        feats = self._apply(self.params, jnp.asarray(x)[None])[0]
        return np.asarray(feats).reshape(ph, pw, -1).astype(np.float32)


class CachingPredictor:
    """Disk-caching wrapper (datasets.py:46-60 load + *_save semantics)."""

    def __init__(self, fn, cache_dir, key_fn=None):
        self.fn = fn
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._counter = 0

    def __call__(self, image, idx=None):
        if idx is None:
            idx = self._counter
        self._counter = idx + 1
        path = os.path.join(self.cache_dir, f"{int(idx):05d}.npy")
        if os.path.exists(path):
            return np.load(path)
        out = self.fn(image)
        np.save(path, out)
        return out


def make_prior_fns(cfg, output_dir, ckpt_dir="pretrained"):
    """Build (depth_fn, feat_fn) per config (mono_prior section). Raises if
    required checkpoints are absent (run.py degrades gracefully)."""
    depth_model = cfg["mono_prior"]["depth"]
    if "metric3d" in depth_model:
        # metric3d is torch-hub only; substitute the equivalent DA2 metric
        # model if present (documented deviation — same role in the system)
        depth_model = "dpt2_vitl_hypersim_20"
    depth_pred = DepthAnythingPredictor(depth_model, ckpt_dir)
    feat_pred = DinoFeaturePredictor(cfg["mono_prior"]["feature_extractor"],
                                     ckpt_dir)

    depth_fn = CachingPredictor(
        depth_pred, os.path.join(output_dir, "mono_priors", "depths"))
    feat_fn = CachingPredictor(
        feat_pred, os.path.join(output_dir, "mono_priors", "features"))
    return depth_fn, feat_fn
