"""DINOv2 vision transformer (flax, inference).

Re-implements the DINOv2 ViT used by the reference for (a) per-pixel
features driving the uncertainty MLP (img_feature_extractors.py:15-82,
dinov2_vits14 / *_reg variants) and (b) the DepthAnythingV2 metric-depth
encoder (thirdparty/depth_anything_v2/.../dinov2.py). Supports arbitrary
14-divisible input sizes via bicubic positional-embedding interpolation,
optional register tokens, and returning intermediate layers.

`load_torch_dinov2` converts torch hub checkpoints (OIHW->HWIO etc.).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        scale = (C // self.num_heads) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + h * ls1

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + h * ls2


class DINOv2(nn.Module):
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    num_register_tokens: int = 0
    base_grid: int = 37  # pretrained pos-embed grid (518/14)

    @nn.compact
    def __call__(self, x, out_layers: Sequence[int] = ()):
        """x: (B, H, W, 3) normalized images, H/W divisible by patch_size.

        Returns list over out_layers (default: last layer only) of
        (patch_tokens (B, h*w, C), cls_token (B, C)), both layer-normed.
        """
        B, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(B, ph * pw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + self.base_grid ** 2, self.embed_dim))

        # interpolate patch pos-embed to (ph, pw)
        pos_cls = pos_embed[:, :1]
        pos_patch = pos_embed[:, 1:].reshape(
            1, self.base_grid, self.base_grid, self.embed_dim)
        pos_patch = jax.image.resize(
            pos_patch, (1, ph, pw, self.embed_dim), method="bicubic")
        pos_patch = pos_patch.reshape(1, ph * pw, self.embed_dim)

        x = x + pos_patch
        cls = jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)) + pos_cls
        tokens = [cls]
        if self.num_register_tokens > 0:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, self.num_register_tokens, self.embed_dim))
            tokens.append(jnp.broadcast_to(
                reg, (B, self.num_register_tokens, self.embed_dim)))
        x = jnp.concatenate(tokens + [x], axis=1)

        out_layers = tuple(out_layers) or (self.depth - 1,)
        outputs = {}
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, name=f"block{i}")(x)
            if i in out_layers:
                outputs[i] = x

        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        n_prefix = 1 + self.num_register_tokens
        result = []
        for i in out_layers:
            h = norm(outputs[i])
            result.append((h[:, n_prefix:], h[:, 0]))
        return result


def make_dinov2(variant: str = "vits", num_register_tokens: int = 0):
    cfg = CONFIGS[variant]
    return DINOv2(num_register_tokens=num_register_tokens, **cfg)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (dinov2 hub format)
# ---------------------------------------------------------------------------

def load_torch_dinov2(state_dict) -> dict:
    """Convert a torch DINOv2 state dict (hub naming) to our flax params."""

    def t(name):
        return jnp.asarray(np.asarray(state_dict[name]))

    params = {
        "patch_embed": {
            "kernel": jnp.asarray(np.asarray(
                state_dict["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "bias": t("patch_embed.proj.bias"),
        },
        "cls_token": t("cls_token"),
        "pos_embed": t("pos_embed"),
        "norm": {"scale": t("norm.weight"), "bias": t("norm.bias")},
    }
    if "register_tokens" in state_dict:
        params["register_tokens"] = t("register_tokens")

    i = 0
    while f"blocks.{i}.norm1.weight" in state_dict:
        p = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": t(f"{p}.norm1.weight"),
                      "bias": t(f"{p}.norm1.bias")},
            "norm2": {"scale": t(f"{p}.norm2.weight"),
                      "bias": t(f"{p}.norm2.bias")},
            "attn": {
                "qkv": {"kernel": t(f"{p}.attn.qkv.weight").T,
                        "bias": t(f"{p}.attn.qkv.bias")},
                "proj": {"kernel": t(f"{p}.attn.proj.weight").T,
                         "bias": t(f"{p}.attn.proj.bias")},
            },
            "mlp_fc1": {"kernel": t(f"{p}.mlp.fc1.weight").T,
                        "bias": t(f"{p}.mlp.fc1.bias")},
            "mlp_fc2": {"kernel": t(f"{p}.mlp.fc2.weight").T,
                        "bias": t(f"{p}.mlp.fc2.bias")},
            "ls1_gamma": t(f"{p}.ls1.gamma"),
            "ls2_gamma": t(f"{p}.ls2.gamma"),
        }
        i += 1
    return params
