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


class Metric3DPredictor:
    """Metric3D-protocol depth (metric_depth_estimators.py:116-155).

    Implements the exact canonical-camera inference protocol of the
    reference's metric3d path: resize so the image fits the 616x1064
    canonical frame, ImageNet-normalize, center-pad, predict, crop the pad,
    bicubic-resize back, scale depth by fx/1000 (the canonical focal), and
    clamp to [0, 300] m. The trunk is pluggable: a converted flax Metric3D
    checkpoint `metric3d_<variant>.pth` is used when present; otherwise the
    DepthAnythingV2 flax net stands in (documented deviation — the reference
    pulls the ConvGRU decoder from torch.hub, which this container cannot
    reach; the canonical protocol, which is what the SLAM system observes,
    is preserved either way).
    """

    CANONICAL = (616, 1064)
    CANONICAL_F = 1000.0

    def __init__(self, depth_model: str, fx: float, ckpt_dir="pretrained",
                 trunk=None, trunk_params=None):
        self.fx = float(fx)
        # a true Metric3D trunk predicts depth in the canonical camera and
        # needs the fx/1000 de-canonicalization; the DA2 stand-in is already
        # metric, so the protocol keeps everything EXCEPT that rescale
        self.canonical_trunk = trunk is not None
        if trunk is not None:
            self.model, self.params = trunk, trunk_params
        else:
            sub = {"metric3d_vit_small": "dpt2_vits_hypersim_20",
                   "metric3d_vit_large": "dpt2_vitl_hypersim_20",
                   "metric3d_vit_giant2": "dpt2_vitl_hypersim_20"}.get(
                       depth_model, "dpt2_vitl_hypersim_20")
            encoder, dataset, max_depth = sub.split("_")[1:4]
            self.model = dpt_mod.DepthAnythingV2(encoder=encoder,
                                                 max_depth=float(max_depth))
            path = os.path.join(
                ckpt_dir,
                f"depth_anything_v2_metric_{dataset}_{encoder}.pth")
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            self.params = dpt_mod.load_torch_depth_anything(sd, encoder)
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image (H, W, 3) float [0,1] -> metric depth (H, W), meters."""
        import cv2

        H, W = image.shape[:2]
        ch, cw = self.CANONICAL
        scale = min(ch / H, cw / W)
        nh, nw = int(H * scale), int(W * scale)
        # the flax trunk needs 14-aligned spatial dims; the canonical frame
        # (616, 1064) is itself 14-aligned, so only the pad split shifts
        nh14, nw14 = (nh // 14) * 14, (nw // 14) * 14
        x = _resize_np(image, nh14, nw14)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        pad_h, pad_w = ch - nh14, cw - nw14
        ph0, pw0 = pad_h // 2, pad_w // 2
        x = np.pad(x, ((ph0, pad_h - ph0), (pw0, pad_w - pw0), (0, 0)))
        depth = np.asarray(self._apply(self.params, jnp.asarray(x)[None])[0])
        depth = depth[ph0:ch - (pad_h - ph0), pw0:cw - (pad_w - pw0)]
        depth = cv2.resize(depth, (W, H), interpolation=cv2.INTER_CUBIC)
        if self.canonical_trunk:
            depth = depth * (self.fx / self.CANONICAL_F)
        return np.clip(depth, 0.0, 300.0).astype(np.float32)


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


class Fit3DFeaturePredictor(DinoFeaturePredictor):
    """FiT3D fine-tuned DINOv2 features (img_feature_extractors.py:15-77).

    FiT3D's `dinov2_small_fine` / `dinov2_reg_small_fine` are the same
    ViT-S/14 architecture as DINOv2 with 3D-aware fine-tuned weights, read
    through get_intermediate_layers -> normed patch tokens — exactly what
    DinoFeaturePredictor computes. Only the checkpoint differs: FiT3D
    weights are looked for first (saved from torch.hub as
    `fit3d_<name>.pth`), falling back to the base DINOv2 checkpoint.
    """

    def __init__(self, extractor: str = "dinov2_small_fine",
                 ckpt_dir="pretrained"):
        base = ("dinov2_vits14_reg" if "reg" in extractor
                else "dinov2_vits14")
        n_reg = 4 if "reg" in extractor else 0
        self.model = dinov2_mod.make_dinov2("vits",
                                            num_register_tokens=n_reg)
        self.params = None
        for cand in (f"fit3d_{extractor}.pth", f"{extractor}.pth",
                     f"{base}.pth", "dinov2_vits14_reg4_pretrain.pth",
                     "dinov2_vits14_pretrain.pth"):
            path = os.path.join(ckpt_dir, cand)
            if os.path.exists(path):
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True)
                self.params = dinov2_mod.load_torch_dinov2(sd)
                break
        if self.params is None:
            raise FileNotFoundError(
                f"no FiT3D/dinov2 checkpoint for {extractor} in {ckpt_dir}")
        self._apply = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x)[0][0])


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
        depth_pred = Metric3DPredictor(depth_model, fx=cfg["cam"]["fx"],
                                       ckpt_dir=ckpt_dir)
    else:
        depth_pred = DepthAnythingPredictor(depth_model, ckpt_dir)
    extractor = cfg["mono_prior"]["feature_extractor"]
    if extractor in ("dinov2_reg_small_fine", "dinov2_small_fine"):
        feat_pred = Fit3DFeaturePredictor(extractor, ckpt_dir)
    else:
        feat_pred = DinoFeaturePredictor(extractor, ckpt_dir)

    depth_fn = CachingPredictor(
        depth_pred, os.path.join(output_dir, "mono_priors", "depths"))
    feat_fn = CachingPredictor(
        feat_pred, os.path.join(output_dir, "mono_priors", "features"))
    return depth_fn, feat_fn
