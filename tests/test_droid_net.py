"""DroidNet architecture tests: shapes, GradClip semantics, cvx upsampling
against a torch oracle of the reference implementation (droid_net.py:23-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from wildgs_slam_tpu.models import droid_net as dn


def test_encoder_shapes():
    params = dn.init_droid_params(jax.random.PRNGKey(0), ht=64, wd=96)
    img = jnp.zeros((2, 64, 96, 3))
    fmap = dn.apply_fnet(params, img)
    ctx = dn.apply_cnet(params, img)
    assert fmap.shape == (2, 8, 12, 128)
    assert ctx.shape == (2, 8, 12, 256)
    net, inp = dn.context_split(ctx)
    assert net.shape == (2, 8, 12, 128)
    # tanh/relu ranges
    assert float(jnp.abs(net).max()) <= 1.0
    assert float(inp.min()) >= 0.0


def test_update_module_shapes():
    params = dn.init_droid_params(jax.random.PRNGKey(1), ht=64, wd=96)
    E, h, w, Fr = 3, 8, 12, 4
    net = jnp.zeros((E, h, w, 128))
    inp = jnp.zeros((E, h, w, 128))
    corr = jnp.zeros((E, h, w, 196))
    flow = jnp.zeros((E, h, w, 4))
    ii = jnp.array([0, 0, 2])
    net2, delta, weight, eta, upmask = dn.apply_update(
        params, net, inp, corr, flow, ii, Fr)
    assert net2.shape == (E, h, w, 128)
    assert delta.shape == (E, h, w, 2)
    assert weight.shape == (E, h, w, 2)
    assert float(weight.min()) >= 0 and float(weight.max()) <= 1
    assert eta.shape == (Fr, h, w)
    assert float(eta.min()) >= 0  # softplus * 0.01
    assert upmask.shape == (Fr, h, w, 8 * 8 * 9)
    # frames with no edges -> zero outputs in agg
    assert float(jnp.abs(upmask[1]).sum()) >= 0  # frame 1 has no edges
    assert float(jnp.abs(upmask[3]).sum()) == 0  # frame 3 out of ii set


def test_grad_clip():
    def f(x):
        return jnp.sum(dn.grad_clip(x * 1000.0))

    g = jax.grad(f)(jnp.ones(4))
    # upstream grad 1.0*1000 scale inside: cotangent at clip point is 1.0
    # (<= 0.01 fails) -> all zero after clip since |1.0| > 0.01
    np.testing.assert_allclose(np.asarray(g), 0.0)

    def f2(x):
        return jnp.sum(dn.grad_clip(x) * 0.005)

    g2 = jax.grad(f2)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g2), 0.005, atol=1e-8)


def torch_cvx_upsample(data, mask):
    """Reference cvx_upsample (droid_net.py:23-37), data (b,h,w,dim)."""
    batch, ht, wd, dim = data.shape
    data = data.permute(0, 3, 1, 2).contiguous()
    mask = mask.view(batch, 1, 9, 8, 8, ht, wd)
    mask = torch.softmax(mask, dim=2)
    up_data = F.unfold(data, kernel_size=(3, 3), padding=(1, 1))
    up_data = up_data.view(batch, dim, 9, 1, 1, ht, wd)
    up_data = torch.sum(mask * up_data, dim=2, keepdim=False)
    up_data = up_data.permute(0, 4, 2, 5, 3, 1).contiguous()
    return up_data.reshape(batch, 8 * ht, 8 * wd, dim)


def test_cvx_upsample_matches_torch():
    rng = np.random.RandomState(0)
    b, h, w, d = 2, 4, 5, 3
    data = rng.randn(b, h, w, d).astype(np.float32)
    mask = rng.randn(b, h, w, 9 * 8 * 8).astype(np.float32)

    ours = np.asarray(dn.cvx_upsample(jnp.asarray(data), jnp.asarray(mask)))

    # torch mask layout: (b, 8*8*9, ht, wd) with channel = 9*64 reshaped
    # (1, 9, 8, 8); ours is (b, h, w, 8*8*9) reshaped (9, 8, 8) — match by
    # permuting ours' channel axis to torch's
    mask_t = torch.from_numpy(
        mask.reshape(b, h, w, 9, 8, 8).transpose(0, 3, 4, 5, 1, 2).reshape(
            b, 9 * 64, h, w))
    theirs = torch_cvx_upsample(torch.from_numpy(data), mask_t).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_checkpoint_converter_roundtrip(tmp_path):
    """Build a fake droid.pth with correct shapes and convert it."""
    import os
    # generate state dict from torch modules mirroring reference shapes
    sd = {}

    def add_conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k)
        sd[name + ".bias"] = torch.randn(o)

    for pre, out in (("fnet", 128), ("cnet", 256)):
        add_conv(f"{pre}.conv1", 32, 3, 7)
        dims = {1: (32, 32), 2: (32, 64), 3: (64, 128)}
        for li, (i_d, o_d) in dims.items():
            for bi in (0, 1):
                cin = i_d if bi == 0 else o_d
                add_conv(f"{pre}.layer{li}.{bi}.conv1", o_d, cin, 3)
                add_conv(f"{pre}.layer{li}.{bi}.conv2", o_d, o_d, 3)
            if li > 1:
                sd[f"{pre}.layer{li}.0.downsample.0.weight"] = torch.randn(
                    o_d, i_d, 1, 1)
                sd[f"{pre}.layer{li}.0.downsample.0.bias"] = torch.randn(o_d)
        add_conv(f"{pre}.conv2", out, 128, 1)

    add_conv("update.corr_encoder.0", 128, 196, 1)
    add_conv("update.corr_encoder.2", 128, 128, 3)
    add_conv("update.flow_encoder.0", 128, 4, 7)
    add_conv("update.flow_encoder.2", 64, 128, 3)
    add_conv("update.weight.0", 128, 128, 3)
    add_conv("update.weight.2", 3, 128, 3)  # 3-ch in ckpt, trimmed to 2
    add_conv("update.delta.0", 128, 128, 3)
    add_conv("update.delta.2", 3, 128, 3)
    for n, (o, i, k) in {
        "convz": (128, 448, 3), "convr": (128, 448, 3), "convq": (128, 448, 3),
        "w": (128, 128, 1), "convz_glo": (128, 128, 1),
        "convr_glo": (128, 128, 1), "convq_glo": (128, 128, 1),
    }.items():
        add_conv(f"update.gru.{n}", o, i, k)
    add_conv("update.agg.conv1", 128, 128, 3)
    add_conv("update.agg.conv2", 128, 128, 3)
    add_conv("update.agg.eta.0", 1, 128, 3)
    add_conv("update.agg.upmask.0", 8 * 8 * 9, 128, 1)

    path = os.path.join(tmp_path, "droid.pth")
    torch.save(sd, path)
    params = dn.load_droid_checkpoint(path)

    # converted tree must run through the network
    img = jnp.zeros((1, 64, 96, 3))
    fmap = dn.apply_fnet(params, img)
    assert fmap.shape == (1, 8, 12, 128)
    E, h, w = 2, 8, 12
    out = dn.apply_update(params, jnp.zeros((E, h, w, 128)),
                          jnp.zeros((E, h, w, 128)),
                          jnp.zeros((E, h, w, 196)),
                          jnp.zeros((E, h, w, 4)), jnp.array([0, 1]), 2)
    assert out[1].shape == (E, h, w, 2)

    # spot-check weight layout conversion: torch OIHW -> flax HWIO
    kt = sd["fnet.conv1.weight"].numpy()
    kf = np.asarray(params["fnet"]["conv1"]["kernel"])
    np.testing.assert_allclose(kf, kt.transpose(2, 3, 1, 0), atol=1e-6)


def test_update_module_bf16_close_to_f32():
    """The TPU path runs the nets in bfloat16 compute (the reference runs
    them under fp16 autocast, factor_graph.py:225-241); the bf16 module must
    track the fp32 module to mixed-precision tolerance."""
    params = dn.init_droid_params(jax.random.PRNGKey(2), ht=64, wd=96)
    rng = np.random.RandomState(0)
    E, h, w, Fr = 3, 8, 12, 3
    net = jnp.asarray(rng.randn(E, h, w, 128).astype(np.float32) * 0.3)
    inp = jnp.asarray(rng.rand(E, h, w, 128).astype(np.float32))
    corr = jnp.asarray(rng.randn(E, h, w, 196).astype(np.float32))
    flow = jnp.asarray(rng.randn(E, h, w, 4).astype(np.float32) * 0.1)
    ii = jnp.array([0, 1, 2])

    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        outs[dt] = dn.UpdateModule(dtype=dt).apply(
            {"params": params["update"]}, net, inp, corr, flow, ii, Fr)
    for a, b, name, tol in zip(
            outs[jnp.float32], outs[jnp.bfloat16],
            ("net", "delta", "weight", "eta", "upmask"),
            (0.05, 0.08, 0.08, 0.08, 0.30)):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32, name  # outputs cast back to fp32
        denom = np.abs(a).max() + 1e-6
        err = np.abs(a - b).max() / denom
        assert err < tol, (name, err)


def test_encoder_bf16_close_to_f32():
    params = dn.init_droid_params(jax.random.PRNGKey(3), ht=64, wd=96)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    f32 = dn.BasicEncoder(128, "instance").apply({"params": params["fnet"]},
                                                 img)
    bf = dn.BasicEncoder(128, "instance", dtype=jnp.bfloat16).apply(
        {"params": params["fnet"]}, img)
    err = np.abs(np.asarray(f32) - np.asarray(bf)).max() / (
        np.abs(np.asarray(f32)).max() + 1e-6)
    assert np.asarray(bf).dtype == np.float32
    assert err < 0.08, err
