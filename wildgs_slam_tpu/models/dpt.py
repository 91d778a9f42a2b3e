"""DPT metric-depth head + DepthAnythingV2 assembly (flax, inference).

Port of thirdparty/depth_anything_v2/metric_depth/depth_anything_v2/
{dpt.py, util/blocks.py}: 4 intermediate ViT layers -> 1x1 projections ->
resize stack -> RefineNet-style feature fusion -> sigmoid head scaled by
max_depth. `load_torch_depth_anything` converts the published checkpoints.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dinov2 import CONFIGS, DINOv2

INTERMEDIATE_LAYER_IDX = {
    "vits": [2, 5, 8, 11],
    "vitb": [2, 5, 8, 11],
    "vitl": [4, 11, 17, 23],
    "vitg": [9, 19, 29, 39],
}
HEAD_CHANNELS = {
    "vits": (64, [48, 96, 192, 384]),
    "vitb": (128, [96, 192, 384, 768]),
    "vitl": (256, [256, 512, 1024, 1024]),
}


def _resize(x, size):
    """Bilinear resize NHWC with EXACT torch align_corners=True semantics
    (F.interpolate in the DPT fusion blocks): sample positions are
    i*(n_in-1)/(n_out-1), separable along H then W. jax.image.resize cannot
    express this; the manual gather keeps the flax head bit-comparable to
    the vendored torch head (tests/test_priors_models.py)."""
    B, H, W, C = x.shape
    oh, ow = int(size[0]), int(size[1])

    def lin(n_in, n_out):
        if n_out == 1:
            z = jnp.zeros(1)
            return z, z.astype(jnp.int32), z.astype(jnp.int32)
        c = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1.0)
                                                    / (n_out - 1.0))
        i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        return c - i0.astype(jnp.float32), i0, i1

    wy, y0, y1 = lin(H, oh)
    wx, x0, x1 = lin(W, ow)
    xh = (x[:, y0] * (1.0 - wy)[None, :, None, None]
          + x[:, y1] * wy[None, :, None, None])
    return (xh[:, :, x0] * (1.0 - wx)[None, None, :, None]
            + xh[:, :, x1] * wx[None, None, :, None])


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(res)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if size is None:
            B, H, W, C = x.shape
            size = (2 * H, 2 * W)
        x = _resize(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    features: int
    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, layers, patch_h, patch_w):
        """layers: 4 (B, N, C) patch-token tensors (shallow -> deep)."""
        outs = []
        for i, x in enumerate(layers):
            B, N, C = x.shape
            h = x.reshape(B, patch_h, patch_w, C)
            h = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(h)
            if i == 0:
                # transpose_kernel=True = torch ConvTranspose2d semantics
                # (gradient-of-conv, spatially flipped kernel)
                h = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), transpose_kernel=True,
                                     name="resize0")(h)
            elif i == 1:
                h = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), transpose_kernel=True,
                                     name="resize1")(h)
            elif i == 3:
                h = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize3")(h)
            outs.append(h)

        rn = [nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name=f"layer{i+1}_rn")(outs[i])
              for i in range(4)]

        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3])
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3])
        path1 = FeatureFusionBlock(self.features, name="refinenet1")(
            path2, rn[0])

        h = nn.Conv(self.features // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="output_conv1")(path1)
        h = _resize(h, (patch_h * 14, patch_w * 14))
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                    name="output_conv2_0")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="output_conv2_2")(h)
        return jax.nn.sigmoid(h)[..., 0]


class DepthAnythingV2(nn.Module):
    encoder: str = "vits"
    max_depth: float = 20.0

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, 3) normalized; returns metric depth (B, H, W)."""
        B, H, W, _ = x.shape
        ph, pw = H // 14, W // 14
        cfg = CONFIGS[self.encoder]
        feats = DINOv2(name="pretrained", **cfg)(
            x, out_layers=INTERMEDIATE_LAYER_IDX[self.encoder])
        features, out_channels = HEAD_CHANNELS[self.encoder]
        depth = DPTHead(features, out_channels, name="depth_head")(
            [f[0] for f in feats], ph, pw)
        return depth * self.max_depth


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def load_torch_depth_anything(state_dict, encoder="vits"):
    """Convert a depth_anything_v2 metric checkpoint to our flax tree."""
    from .dinov2 import load_torch_dinov2

    sd = {k: v for k, v in state_dict.items()}
    enc_sd = {k[len("pretrained."):]: v for k, v in sd.items()
              if k.startswith("pretrained.")}
    pretrained = load_torch_dinov2(enc_sd)

    def cw(name):
        return jnp.asarray(np.asarray(sd[name]).transpose(2, 3, 1, 0))

    def ctw(name):
        # ConvTranspose torch (I, O, kh, kw) -> flax transpose_kernel=True
        # layout (kh, kw, O, I)
        return jnp.asarray(np.asarray(sd[name]).transpose(2, 3, 1, 0))

    def b(name):
        return jnp.asarray(np.asarray(sd[name]))

    h = "depth_head."
    head = {}
    for i in range(4):
        head[f"project{i}"] = {"kernel": cw(f"{h}projects.{i}.weight"),
                               "bias": b(f"{h}projects.{i}.bias")}
    head["resize0"] = {"kernel": ctw(f"{h}resize_layers.0.weight"),
                       "bias": b(f"{h}resize_layers.0.bias")}
    head["resize1"] = {"kernel": ctw(f"{h}resize_layers.1.weight"),
                       "bias": b(f"{h}resize_layers.1.bias")}
    head["resize3"] = {"kernel": cw(f"{h}resize_layers.3.weight"),
                       "bias": b(f"{h}resize_layers.3.bias")}
    for i in range(4):
        head[f"layer{i+1}_rn"] = {
            "kernel": cw(f"{h}scratch.layer{i+1}_rn.weight")}
    for i in range(1, 5):
        rb = f"{h}scratch.refinenet{i}."
        head[f"refinenet{i}"] = {
            "rcu1": {"conv1": {"kernel": cw(rb + "resConfUnit1.conv1.weight"),
                               "bias": b(rb + "resConfUnit1.conv1.bias")},
                     "conv2": {"kernel": cw(rb + "resConfUnit1.conv2.weight"),
                               "bias": b(rb + "resConfUnit1.conv2.bias")}},
            "rcu2": {"conv1": {"kernel": cw(rb + "resConfUnit2.conv1.weight"),
                               "bias": b(rb + "resConfUnit2.conv1.bias")},
                     "conv2": {"kernel": cw(rb + "resConfUnit2.conv2.weight"),
                               "bias": b(rb + "resConfUnit2.conv2.bias")}},
            "out_conv": {"kernel": cw(rb + "out_conv.weight"),
                         "bias": b(rb + "out_conv.bias")},
        }
    head["output_conv1"] = {"kernel": cw(f"{h}scratch.output_conv1.weight"),
                            "bias": b(f"{h}scratch.output_conv1.bias")}
    head["output_conv2_0"] = {
        "kernel": cw(f"{h}scratch.output_conv2.0.weight"),
        "bias": b(f"{h}scratch.output_conv2.0.bias")}
    head["output_conv2_2"] = {
        "kernel": cw(f"{h}scratch.output_conv2.2.weight"),
        "bias": b(f"{h}scratch.output_conv2.2.bias")}

    return {"pretrained": pretrained, "depth_head": head}
