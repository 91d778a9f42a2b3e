"""Native library tests (build via g++, exercised through ctypes)."""

import os

import cv2
import numpy as np
import pytest

from wildgs_slam_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_read_image_matches_cv2(lib, tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, img[..., ::-1])  # BGR on disk
    out = native.read_image_native(p, 56, 40)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_depth16_roundtrip(lib, tmp_path):
    depth = (np.random.RandomState(1).rand(32, 48) * 20000).astype(np.uint16)
    p = str(tmp_path / "d.png")
    cv2.imwrite(p, depth)
    fl = native.FrameLoader([p], 48, 32, is_depth=True, depth_scale=5000.0)
    out = fl.get(0)
    np.testing.assert_allclose(out, depth.astype(np.float32) / 5000.0,
                               atol=1e-4)


def test_prefetching_loader(lib, tmp_path):
    rng = np.random.RandomState(2)
    paths, refs = [], []
    for i in range(5):
        img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img[..., ::-1])
        paths.append(p)
        refs.append(img)
    fl = native.FrameLoader(paths, 24, 24, n_threads=2)
    # out-of-order access works too
    for i in [0, 2, 1, 4, 3]:
        np.testing.assert_allclose(
            fl.get(i), refs[i].astype(np.float32) / 255.0, atol=1e-6)


def test_ply_writer_roundtrip(lib, tmp_path):
    from wildgs_slam_tpu.slam.gaussian_map import load_ply

    data = np.random.RandomState(3).rand(100, 17).astype(np.float32)
    names = (["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2",
              "opacity"] + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    p = str(tmp_path / "g.ply")
    assert native.write_ply_native(p, data, names)
    back = load_ply(p)
    np.testing.assert_allclose(back["xyz"], data[:, :3], atol=1e-7)
    np.testing.assert_allclose(back["opacity"][:, 0], data[:, 9], atol=1e-7)


def test_prefetching_stream(lib, tmp_path):
    """PrefetchingStream output matches the plain dataset path."""
    from tests.test_utils import make_tum_dataset
    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.utils.datasets import TUM_RGBD, PrefetchingStream

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["cam"].update(H=48, W=64, fx=50.0, fy=50.0, cx=32.0, cy=24.0,
                      H_out=32, W_out=48, H_edge=0, W_edge=0)
    cfg["data"]["input_folder"] = str(tmp_path / "tum")
    make_tum_dataset(str(tmp_path / "tum"))
    ds = TUM_RGBD(cfg)
    ps = PrefetchingStream(ds)
    i1, c1, d1, p1 = ds[2]
    i2, c2, d2, p2 = ps[2]
    assert i1 == i2
    # resize kernels differ slightly (cv2 INTER_LINEAR vs ours) — bounded
    assert float(np.abs(c1 - c2).mean()) < 0.02
    np.testing.assert_allclose(p1, p2)
