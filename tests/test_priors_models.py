"""Golden tests for the flax DINOv2 against the reference's vendored torch
implementation (random weights converted through our loader). The DPT head
is checked structurally (shapes + converter coverage) since torchvision is
absent in this image."""

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
