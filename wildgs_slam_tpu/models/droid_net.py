"""DROID-SLAM recurrent update network in flax (NHWC, TPU layout).

Re-implements the reference's src/modules/droid_net/ (extractor.py, gru.py,
droid_net.py, clipping.py) as flax modules:

  - BasicEncoder: 1/8-resolution residual CNN; fnet (out 128, instance norm)
    and cnet (out 256, no norm) (extractor.py:75-140).
  - ConvGRU with the global-context gate (gru.py:19-47).
  - UpdateModule: corr/flow encoders, GRU, delta/weight heads (2-channel,
    trimmed as in slam.py:87-90) + GraphAgg damping/upsample-mask head
    (droid_net.py:48-153).
  - GradClip: identity forward, cotangent clamp at 0.01 + NaN zeroing
    (clipping.py:19-40), as a jax.custom_vjp.
  - cvx_upsample: softmax-convex 8x upsampling (droid_net.py:23-45).

`load_droid_checkpoint` converts the published torch `droid.pth` weights
(OIHW -> HWIO) including the 2-channel head trim.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

GRAD_CLIP = 0.01


def net_dtype():
    """Compute dtype for the DROID nets on the current backend.

    The reference runs fnet/cnet in half precision and the update op under
    torch.cuda.amp.autocast (src/motion_filter.py, factor_graph.py:225-241);
    bfloat16 is the TPU-native equivalent (2x MXU rate, fp32 weights).
    CPU (tests, golden oracles) stays fp32. Set WILDGS_NET_F32=1 to force
    fp32 on TPU."""
    import os
    if os.environ.get("WILDGS_NET_F32"):
        return jnp.float32
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


@jax.custom_vjp
def grad_clip(x):
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, 0.0, g)
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (g,)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d(affine=False) on NHWC."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "none"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def norm(y):
            if self.norm_fn == "instance":
                # autocast keeps norms in fp32 (torch amp); so do we
                return instance_norm(y.astype(jnp.float32))
            return y  # 'none'

        pad = ((1, 1), (1, 1))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=pad, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=pad, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(norm(y))
        if self.stride > 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        name="downsample", dtype=self.dtype)(x)
            x = norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-res residual CNN (extractor.py:75-140).

    `dtype` = compute dtype for the convolutions (weights stay fp32): the
    reference runs fnet/cnet in fp16 (motion_filter.py half precision) —
    bfloat16 is the TPU-native equivalent at 2x MXU rate. Norms compute in
    fp32 like torch amp."""
    out_dim: int
    norm_fn: str = "none"
    dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) -> (N, H/8, W/8, out_dim)."""
        h = nn.Conv(self.dim, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    name="conv1", dtype=self.dtype)(x)
        if self.norm_fn == "instance":
            h = instance_norm(h.astype(jnp.float32))
        h = nn.relu(h)
        d = self.dim
        for li, (planes, stride) in enumerate(
                [(d, 1), (2 * d, 2), (4 * d, 2)], start=1):
            h = ResidualBlock(planes, self.norm_fn, stride,
                              name=f"layer{li}_0", dtype=self.dtype)(h)
            h = ResidualBlock(planes, self.norm_fn, 1, name=f"layer{li}_1",
                              dtype=self.dtype)(h)
        out = nn.Conv(self.out_dim, (1, 1), name="conv2",
                      dtype=self.dtype)(h)
        return out.astype(jnp.float32)


class ConvGRU(nn.Module):
    h_planes: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp):
        """net (N,H,W,128); inp (N,H,W,*) concatenated inputs."""
        pad = ((1, 1), (1, 1))
        dt = self.dtype
        net = net.astype(dt)
        inp = inp.astype(dt)
        net_inp = jnp.concatenate([net, inp], axis=-1)

        glo = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (1, 1), name="w", dtype=dt)(net)) * net
        # global mean in fp32 (H*W-term reduction)
        glo = glo.astype(jnp.float32).mean(axis=(1, 2), keepdims=True)
        glo = glo.astype(dt)

        z = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=pad, name="convz",
                    dtype=dt)(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convz_glo", dtype=dt)(glo))
        r = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=pad, name="convr",
                    dtype=dt)(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convr_glo", dtype=dt)(glo))
        q = jnp.tanh(
            nn.Conv(self.h_planes, (3, 3), padding=pad, name="convq",
                    dtype=dt)(
                jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(self.h_planes, (1, 1), name="convq_glo", dtype=dt)(glo))
        return ((1 - z) * net + z * q).astype(jnp.float32)


class GraphAgg(nn.Module):
    """Per-source-frame aggregation producing damping + upsample mask
    (droid_net.py:48-80). The scatter_mean over ii becomes a segment mean."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, ii, num_frames: int):
        """net (E,H,W,128), ii (E,) source frame per edge.

        Returns (eta (F,H,W), upmask (F,H,W,8*8*9)) for F=num_frames slots;
        slots with no edges are zero."""
        pad = ((1, 1), (1, 1))
        dt = self.dtype
        h = nn.relu(nn.Conv(128, (3, 3), padding=pad, name="conv1",
                            dtype=dt)(net))
        # segment mean over source frame (fp32 accumulation)
        h = h.astype(jnp.float32)
        seg_sum = jax.ops.segment_sum(h, ii, num_segments=num_frames)
        counts = jax.ops.segment_sum(jnp.ones((h.shape[0],)), ii,
                                     num_segments=num_frames)
        h = seg_sum / jnp.clip(counts, 1.0, None)[:, None, None, None]
        h = nn.relu(nn.Conv(128, (3, 3), padding=pad, name="conv2",
                            dtype=dt)(h))
        eta = nn.softplus(grad_clip(
            nn.Conv(1, (3, 3), padding=pad, name="eta",
                    dtype=dt)(h).astype(jnp.float32)))[..., 0]
        upmask = nn.Conv(8 * 8 * 9, (1, 1), name="upmask",
                         dtype=dt)(h).astype(jnp.float32)
        return 0.01 * eta, upmask


class UpdateModule(nn.Module):
    """GRU update operator (droid_net.py:83-153). All tensors NHWC.

    `dtype` = conv compute dtype. The reference runs this op under
    torch.cuda.amp.autocast (factor_graph.py:225-241) with fp16 compute and
    fp32 weights and casts the outputs back to fp32; bfloat16 here is the
    TPU equivalent (weights stay fp32, outputs cast to fp32)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, ii, num_frames: int):
        """net (E,H,W,128), inp (E,H,W,128), corr (E,H,W,196),
        flow (E,H,W,4), ii (E,). Returns (net, delta, weight, eta, upmask)."""
        pad = ((1, 1), (1, 1))
        dt = self.dtype
        c = nn.relu(nn.Conv(128, (1, 1), name="corr_enc1", dtype=dt)(corr))
        c = nn.relu(nn.Conv(128, (3, 3), padding=pad, name="corr_enc2",
                            dtype=dt)(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)),
                            name="flow_enc1", dtype=dt)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=pad, name="flow_enc2",
                            dtype=dt)(f))

        net = ConvGRU(name="gru", dtype=dt)(
            net, jnp.concatenate([inp, c.astype(jnp.float32),
                                  f.astype(jnp.float32)], axis=-1))

        d = nn.relu(nn.Conv(128, (3, 3), padding=pad, name="delta1",
                            dtype=dt)(net))
        delta = grad_clip(
            nn.Conv(2, (3, 3), padding=pad, name="delta2",
                    dtype=dt)(d).astype(jnp.float32))
        w = nn.relu(nn.Conv(128, (3, 3), padding=pad, name="weight1",
                            dtype=dt)(net))
        weight = jax.nn.sigmoid(grad_clip(
            nn.Conv(2, (3, 3), padding=pad, name="weight2",
                    dtype=dt)(w).astype(jnp.float32)))

        eta, upmask = GraphAgg(name="agg", dtype=dt)(net, ii, num_frames)
        return net, delta, weight, eta, upmask


class DroidNet(nn.Module):
    """fnet/cnet/update bundle (droid_net.py:156-161)."""

    @nn.compact
    def __call__(self, images, net, inp, corr, flow, ii, num_frames):
        # single apply for init purposes; use the sub-applies in practice
        fmap = BasicEncoder(128, "instance", name="fnet")(images)
        context = BasicEncoder(256, "none", name="cnet")(images)
        out = UpdateModule(name="update")(net, inp, corr, flow, ii, num_frames)
        return fmap, context, out


def init_droid_params(key: jax.Array, ht: int = 48, wd: int = 64):
    """Random-init full parameter tree (shapes identical to droid.pth)."""
    model = DroidNet()
    h, w = ht // 8, wd // 8
    E, F = 2, 2
    variables = model.init(
        key,
        jnp.zeros((1, ht, wd, 3)),
        jnp.zeros((E, h, w, 128)),
        jnp.zeros((E, h, w, 128)),
        jnp.zeros((E, h, w, 196)),
        jnp.zeros((E, h, w, 4)),
        jnp.zeros((E,), jnp.int32),
        F,
    )
    return variables["params"]


def context_split(context):
    """cnet output (N,H,W,256) -> (net, inp) = (tanh, relu) halves
    (motion_filter.py:39-43)."""
    net, inp = jnp.split(context, 2, axis=-1)
    return jnp.tanh(net), nn.relu(inp)


# ---------------------------------------------------------------------------
# convex upsampling (droid_net.py:23-45)
# ---------------------------------------------------------------------------

def cvx_upsample(data: jax.Array, mask: jax.Array) -> jax.Array:
    """data (B, H, W, D); mask (B, H, W, 8*8*9) -> (B, 8H, 8W, D)."""
    B, H, W, D = data.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood stack, torch unfold order: (dy, dx) row-major
    neigh = jnp.stack(
        [pad[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)],
        axis=3)  # (B, H, W, 9, D)

    up = jnp.einsum("bhwkij,bhwkd->bhwijd", m, neigh)  # (B,H,W,8,8,D)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, D)
    return up


def upsample_disp(disp: jax.Array, mask: jax.Array) -> jax.Array:
    """disp (B, H, W) + mask (B, H, W, 576) -> (B, 8H, 8W)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _cw(t):  # conv weight OIHW -> HWIO
    import numpy as np
    return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))


def _b(t):
    import numpy as np
    return jnp.asarray(np.asarray(t))


def load_droid_checkpoint(path: str):
    """Convert droid.pth (torch) to our flax param tree, incl. the 2-channel
    weight/delta head trim (slam.py:79-95)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    state = {k.replace("module.", ""): v.float() for k, v in state.items()}
    # head trim: keep first 2 output channels
    state["update.weight.2.weight"] = state["update.weight.2.weight"][:2]
    state["update.weight.2.bias"] = state["update.weight.2.bias"][:2]
    state["update.delta.2.weight"] = state["update.delta.2.weight"][:2]
    state["update.delta.2.bias"] = state["update.delta.2.bias"][:2]

    def conv(prefix):
        return {"kernel": _cw(state[prefix + ".weight"]),
                "bias": _b(state[prefix + ".bias"])}

    def encoder(pre):
        p = {"conv1": conv(f"{pre}.conv1"), "conv2": conv(f"{pre}.conv2")}
        for li in (1, 2, 3):
            for bi in (0, 1):
                blk = {"conv1": conv(f"{pre}.layer{li}.{bi}.conv1"),
                       "conv2": conv(f"{pre}.layer{li}.{bi}.conv2")}
                if li > 1 and bi == 0:
                    blk["downsample"] = conv(f"{pre}.layer{li}.{bi}.downsample.0")
                p[f"layer{li}_{bi}"] = blk
        return p

    update = {
        "corr_enc1": conv("update.corr_encoder.0"),
        "corr_enc2": conv("update.corr_encoder.2"),
        "flow_enc1": conv("update.flow_encoder.0"),
        "flow_enc2": conv("update.flow_encoder.2"),
        "delta1": conv("update.delta.0"),
        "delta2": conv("update.delta.2"),
        "weight1": conv("update.weight.0"),
        "weight2": conv("update.weight.2"),
        "gru": {n: conv(f"update.gru.{n}") for n in
                ("convz", "convr", "convq", "w", "convz_glo", "convr_glo",
                 "convq_glo")},
        "agg": {
            "conv1": conv("update.agg.conv1"),
            "conv2": conv("update.agg.conv2"),
            "eta": conv("update.agg.eta.0"),
            "upmask": conv("update.agg.upmask.0"),
        },
    }
    return {"fnet": encoder("fnet"), "cnet": encoder("cnet"),
            "update": update}


# convenience appliers -------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def apply_fnet(params, images):
    return BasicEncoder(128, "instance").apply({"params": params["fnet"]},
                                               images)


@functools.partial(jax.jit, static_argnames=())
def apply_cnet(params, images):
    return BasicEncoder(256, "none").apply({"params": params["cnet"]}, images)


def apply_update(params, net, inp, corr, flow, ii, num_frames: int):
    return UpdateModule().apply({"params": params["update"]}, net, inp, corr,
                                flow, ii, num_frames)
