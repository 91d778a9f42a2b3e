"""SSIM / median filter / loss tests with torch-based oracles.

The oracles reimplement the reference's formulas (loss_utils.ssim,
mapping_utils._ssim, MedianPool2d) in torch on CPU so our JAX ports are
checked against the exact math, not just properties."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wildgs_slam_tpu.ops import ssim as jssim
from wildgs_slam_tpu.slam import losses


def _torch_window(window_size, channel, sigma=1.5):
    x = torch.arange(window_size, dtype=torch.float64)
    g = torch.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    w1 = g.unsqueeze(1)
    w2 = w1.mm(w1.t()).unsqueeze(0).unsqueeze(0)
    return w2.expand(channel, 1, window_size, window_size).contiguous()


def torch_ssim(img1, img2, window_size=11):
    """Reference loss_utils.ssim (standard) for (C,H,W) tensors."""
    channel = img1.size(0)
    window = _torch_window(window_size, channel)
    img1, img2 = img1[None], img2[None]
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=channel)
    mu2 = F.conv2d(img2, window, padding=pad, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=channel) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean().item()


def torch_ssim_components(img1, img2, window_size=11):
    """Reference mapping_utils._ssim for (C,H,W)."""
    eps = float(np.finfo(np.float32).eps)
    channel = img1.size(0)
    window = _torch_window(window_size, channel)
    img1, img2 = img1[None], img2[None]
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=channel)
    mu2 = F.conv2d(img2, window, padding=pad, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=channel) - mu1_mu2
    e = torch.tensor([eps])
    s1 = torch.maximum(e, s1)
    s2 = torch.maximum(e, s2)
    s12 = torch.sign(s12) * torch.minimum(torch.sqrt(s1 * s2), torch.abs(s12))
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    C3 = C2 / 2
    lum = (2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)
    con = (2 * torch.sqrt(s1) * torch.sqrt(s2) + C2) / (s1 + s2 + C2)
    struc = (s12 + C3) / (torch.sqrt(s1) * torch.sqrt(s2) + C3)
    con = torch.clamp(con, max=0.98)
    struc = torch.clamp(struc, max=0.98)
    return (lum.mean(1).squeeze(0), con.mean(1).squeeze(0),
            struc.mean(1).squeeze(0))


@pytest.fixture
def imgs():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 40, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(32, 40, 3).astype(np.float32), 0, 1)
    return a, b


def test_standard_ssim_matches_torch(imgs):
    a, b = imgs
    ours = float(jssim.ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_ssim(torch.from_numpy(a).permute(2, 0, 1),
                        torch.from_numpy(b).permute(2, 0, 1))
    assert abs(ours - theirs) < 1e-5
    assert abs(float(jssim.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-4


def test_ssim_components_match_torch(imgs):
    a, b = imgs
    lj, cj, sj = jssim.ssim_components(jnp.asarray(a), jnp.asarray(b))
    lt, ct, st = torch_ssim_components(
        torch.from_numpy(a).permute(2, 0, 1),
        torch.from_numpy(b).permute(2, 0, 1))
    np.testing.assert_allclose(np.asarray(lj), lt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cj), ct.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sj), st.numpy(), atol=2e-4)


def test_median_pool_matches_torch(imgs):
    a, _ = imgs
    x = a[..., 0]
    k = 5
    ours = np.asarray(jssim.median_pool2d(jnp.asarray(x), k))
    # reference MedianPool2d(same=True): asymmetric pad + unfold + median
    xt = torch.from_numpy(x)[None, None]
    pl = (k - 1) // 2
    pr = k - 1 - pl
    xp = F.pad(xt, (pl, pr, pl, pr), mode="constant", value=0)
    unf = xp.unfold(2, k, 1).unfold(3, k, 1)
    med = unf.contiguous().view(*unf.size()[:4], -1).median(dim=-1)[0]
    np.testing.assert_allclose(ours, med[0, 0].numpy(), atol=1e-6)


def test_scharr_gradient_matches_torch(imgs):
    a, _ = imgs
    gray = a.mean(-1)
    gv, gh = losses.image_gradient(jnp.asarray(gray))
    conv_y = torch.tensor([[3, 0, -3], [10, 0, -10], [3, 0, -3]],
                          dtype=torch.float32)
    conv_x = torch.tensor([[3, 10, 3], [0, 0, 0], [-3, -10, -3]],
                          dtype=torch.float32)
    norm = 1.0 / conv_y.abs().sum()
    p = F.pad(torch.from_numpy(gray)[None, None], (1, 1, 1, 1), mode="reflect")
    tv = norm * F.conv2d(p, conv_x.view(1, 1, 3, 3))
    th = norm * F.conv2d(p, conv_y.view(1, 1, 3, 3))
    np.testing.assert_allclose(np.asarray(gv), tv[0, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), th[0, 0].numpy(), atol=1e-5)


def test_uncertainty_loss_runs_and_grads(imgs):
    a, b = imgs
    H, W = a.shape[:2]
    hp, wp = H // 4, W // 4
    unc = jnp.full((hp, wp), 0.5)
    cfg = dict(
        alpha=0.95, rgb_boundary_threshold=0.01, ssim_loss=True,
        lambda_dssim=0.2,
        uncertainty_params=dict(
            ssim_window_size=11, ssim_median_filter_size=5,
            uncer_depth_mult=0.5, opacity_th_for_uncer_loss=0.9,
            ssim_mult=0.01),
    )

    def f(unc):
        out = losses.mapping_loss_uncertainty(
            jnp.asarray(b), jnp.ones((H, W)) * 2.0, jnp.asarray(a),
            jnp.ones((H, W)) * 2.1, unc, jnp.ones((H, W)) * 0.97,
            jnp.float32(0), jnp.float32(0), train_frac=0.5, ssim_frac=0.5,
            cfg=cfg)
        return out.total

    val, grad = jax.value_and_grad(f)(unc)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).sum()) > 0


def test_dino_regularization():
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (50, 16))
    # identical features + identical uncertainty -> zero variance
    same = jnp.tile(feats[:1], (50, 1))
    u_same = jnp.full((50,), 0.7)
    assert float(losses.dino_regularization_loss(u_same, same)) < 1e-8
    # varied uncertainty on similar features -> positive
    u_var = jax.random.uniform(jax.random.PRNGKey(1), (50,))
    assert float(losses.dino_regularization_loss(u_var, same)) > 1e-4
