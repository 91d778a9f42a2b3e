"""Golden tests for the flax DINOv2 AND the full DepthAnythingV2 DPT
metric-depth network against the reference's vendored torch implementation
(random weights converted through our loader). torchvision is absent in this
image; the vendored dpt.py only needs transforms.Compose at import time, so
a stub module suffices for the forward-pass oracle."""

import types

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import os

_REF = "/root/reference/thirdparty/depth_anything_v2/metric_depth"
sys.path.insert(0, _REF)

from wildgs_slam_tpu.models import dinov2 as jdino
from wildgs_slam_tpu.models import dpt as jdpt

# the torch-oracle tests need the reference checkout; structural tests run
# everywhere
_HAS_REF = os.path.isdir(_REF)
needs_ref = pytest.mark.skipif(not _HAS_REF,
                               reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def torch_dinov2():
    if not _HAS_REF:
        pytest.skip("reference checkout unavailable")
    from depth_anything_v2.dinov2 import DINOv2 as TorchDINOv2

    torch.manual_seed(0)
    m = TorchDINOv2(model_name="vits").eval()
    return m


@needs_ref
def test_dinov2_matches_torch_native_grid(torch_dinov2):
    """At 518x518 the pos-embed needs no interpolation — outputs must match
    to fp32 tolerance."""
    m = torch_dinov2
    params = jdino.load_torch_dinov2(m.state_dict())
    model = jdino.make_dinov2("vits")

    rng = np.random.RandomState(0)
    x = rng.rand(1, 518, 518, 3).astype(np.float32)

    with torch.no_grad():
        out_t = m.get_intermediate_layers(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 1,
            return_class_token=True)
    patches_t, cls_t = out_t[0][0].numpy(), out_t[0][1].numpy()

    (patches_j, cls_j), = model.apply({"params": params}, jnp.asarray(x),
                                      out_layers=(11,))
    np.testing.assert_allclose(np.asarray(patches_j), patches_t, atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t, atol=2e-4,
                               rtol=1e-3)


@needs_ref
def test_dinov2_interpolated_grid_close(torch_dinov2):
    """Non-native grid exercises pos-embed interpolation; implementations
    use different resize kernels so only require closeness."""
    m = torch_dinov2
    params = jdino.load_torch_dinov2(m.state_dict())
    model = jdino.make_dinov2("vits")

    rng = np.random.RandomState(1)
    x = rng.rand(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        out_t = m.get_intermediate_layers(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 1,
            return_class_token=True)
    patches_t = out_t[0][0].numpy()
    (patches_j, _), = model.apply({"params": params}, jnp.asarray(x),
                                  out_layers=(11,))
    # cosine similarity per token must be ~1
    a = np.asarray(patches_j)[0]
    b = patches_t[0]
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99, f"min cos {cos.min()}"


@needs_ref
def test_multiple_intermediate_layers(torch_dinov2):
    m = torch_dinov2
    params = jdino.load_torch_dinov2(m.state_dict())
    model = jdino.make_dinov2("vits")
    x = np.random.RandomState(2).rand(1, 518, 518, 3).astype(np.float32)
    with torch.no_grad():
        outs_t = m.get_intermediate_layers(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), [2, 5, 8, 11],
            return_class_token=True)
    outs_j = model.apply({"params": params}, jnp.asarray(x),
                         out_layers=(2, 5, 8, 11))
    for (pj, cj), (pt, ct) in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(pj), pt.numpy(), atol=2e-4,
                                   rtol=1e-3)


@needs_ref
def test_depth_anything_full_forward_matches_torch():
    """FULL DA2-small metric-depth forward (DINOv2 + DPT head) vs the
    vendored torch network with converted random weights, on the native
    518x518 grid (no pos-embed interpolation). fp32 allclose."""
    # stub torchvision: the vendored dpt.py imports transforms.Compose at
    # module scope but the oracle only needs forward()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = lambda ts: ts
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDA2

    torch.manual_seed(3)
    m = TorchDA2(encoder="vits", features=64,
                 out_channels=[48, 96, 192, 384], max_depth=20.0).eval()

    params = jdpt.load_torch_depth_anything(m.state_dict(), encoder="vits")
    model = jdpt.DepthAnythingV2(encoder="vits", max_depth=20.0)

    # 1) DPT HEAD alone with identical controlled inputs: tight tolerance
    # (isolates converter/layout bugs from fp accumulation)
    rng = np.random.RandomState(4)
    ph = pw = 10
    feats = [rng.randn(1, ph * pw, 384).astype(np.float32) * 0.5
             for _ in range(4)]
    with torch.no_grad():
        d_head_t = m.depth_head(
            [(torch.from_numpy(f), torch.zeros(1, 384)) for f in feats],
            ph, pw).numpy()[:, 0]
    d_head_j = np.asarray(jdpt.DPTHead(64, [48, 96, 192, 384]).apply(
        {"params": params["depth_head"]},
        [jnp.asarray(f) for f in feats], ph, pw))
    np.testing.assert_allclose(d_head_j, d_head_t, atol=2e-5, rtol=1e-4)

    # 2) full net end-to-end: random unnormalized weights amplify the
    # encoder's ~2e-4 fp drift through the RefineNet residual chain, so
    # gate on near-perfect correlation + bounded relative error
    x = rng.rand(1, 518, 518, 3).astype(np.float32)
    with torch.no_grad():
        d_t = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    d_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert d_j.shape == d_t.shape == (1, 518, 518)
    a, b = d_j.ravel(), d_t.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    rel = np.abs(a - b) / (np.abs(b) + 1e-6)
    assert corr > 0.9999, f"corr {corr}"
    assert rel.max() < 0.02, f"max rel {rel.max()}"


def test_depth_anything_runs_and_shapes():
    """Full DA2-small forward with random init: output shape + range."""
    model = jdpt.DepthAnythingV2(encoder="vits", max_depth=20.0)
    x = jnp.zeros((1, 112, 112, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    depth = model.apply({"params": params}, x)
    assert depth.shape == (1, 112, 112)
    d = np.asarray(depth)
    assert np.all(d >= 0) and np.all(d <= 20.0)


def test_register_tokens_variant():
    model = jdino.make_dinov2("vits", num_register_tokens=4)
    x = jnp.zeros((1, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    (patches, cls), = model.apply({"params": params}, x)
    assert patches.shape == (1, 16, 384)  # registers excluded from output


def test_metric3d_canonical_protocol():
    """Metric3DPredictor implements the reference's canonical-camera
    protocol (metric_depth_estimators.py:116-155): fit into 616x1064,
    center-pad, crop back, resize to input, fx/1000 de-canonicalization
    (for a true canonical trunk), clamp to [0, 300]."""
    import flax.linen as nn

    from wildgs_slam_tpu.models.priors import Metric3DPredictor

    class ConstTrunk(nn.Module):
        value: float

        @nn.compact
        def __call__(self, x):
            # touch a parameter so apply({"params": ...}) has a tree
            b = self.param("b", lambda k: jnp.zeros(()))
            return jnp.full(x.shape[:3], self.value) + b

    trunk = ConstTrunk(value=1500.0)
    params = trunk.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 616, 1064, 3)))["params"]

    img = np.random.RandomState(0).rand(120, 160, 3).astype(np.float32)

    p = Metric3DPredictor("metric3d_vit_small", fx=100.0, trunk=trunk,
                          trunk_params=params)
    d = p(img)
    assert d.shape == (120, 160)
    np.testing.assert_allclose(d, 150.0, rtol=1e-5)  # 1500 * 100/1000

    p2 = Metric3DPredictor("metric3d_vit_small", fx=500.0, trunk=trunk,
                           trunk_params=params)
    d2 = p2(img)
    np.testing.assert_allclose(d2, 300.0, rtol=1e-5)  # clamped from 750


@needs_ref
def test_fit3d_feature_predictor(tmp_path, torch_dinov2):
    """Fit3D names map onto the DINOv2 backbone; a saved fit3d checkpoint
    is picked up and produces the same patch-feature grid as the direct
    DINOv2 path."""
    from wildgs_slam_tpu.models.priors import (DinoFeaturePredictor,
                                               Fit3DFeaturePredictor)

    ck = tmp_path / "fit3d_dinov2_small_fine.pth"
    torch.save(torch_dinov2.state_dict(), ck)
    torch.save(torch_dinov2.state_dict(), tmp_path / "dinov2_vits14.pth")

    img = np.random.RandomState(1).rand(56, 70, 3).astype(np.float32)
    fit = Fit3DFeaturePredictor("dinov2_small_fine", ckpt_dir=str(tmp_path))
    base = DinoFeaturePredictor("dinov2_vits14", ckpt_dir=str(tmp_path))
    fa, fb = fit(img), base(img)
    assert fa.shape == (4, 5, 384)
    np.testing.assert_allclose(fa, fb, atol=1e-6)
