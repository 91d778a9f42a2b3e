"""Control-channel tests: pause/resume/stop/checkpoint via file and HTTP
(the reference's Packet_vis2main semantics, src/gui/gui_utils.py:86-190)."""

import json
import os
import threading
import time
import urllib.request

from wildgs_slam_tpu.gui.control import ControlChannel


def write_cmd(path, cmd):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cmd, f)
    os.replace(tmp, path)


def test_file_commands(tmp_path):
    chan = ControlChannel(str(tmp_path))
    assert chan.poll() == {"pause": False, "stop": False,
                           "save_checkpoint": False}

    write_cmd(chan.path, {"pause": True})
    assert chan.poll()["pause"]

    # one-shot checkpoint request
    time.sleep(0.01)  # distinct mtime
    write_cmd(chan.path, {"save_checkpoint": True})
    assert chan.consume_checkpoint_request()
    assert not chan.consume_checkpoint_request()

    # wait_if_paused blocks until resumed from another thread
    t0 = time.time()

    def resume():
        time.sleep(0.4)
        write_cmd(chan.path, {"pause": False})

    th = threading.Thread(target=resume)
    th.start()
    chan.wait_if_paused(interval=0.05)
    th.join()
    assert time.time() - t0 >= 0.3
    assert not chan.poll()["pause"]

    # stop breaks a pause wait
    time.sleep(0.01)
    write_cmd(chan.path, {"pause": True, "stop": True})
    chan.wait_if_paused(interval=0.05)  # returns immediately
    assert chan.poll()["stop"]


def test_http_commands(tmp_path):
    chan = ControlChannel(str(tmp_path), http_port=0)  # auto port
    assert chan.http_port
    base = f"http://127.0.0.1:{chan.http_port}"

    def get(cmd):
        with urllib.request.urlopen(f"{base}/{cmd}", timeout=5) as r:
            return json.loads(r.read())

    assert not get("status")["pause"]
    assert get("pause")["pause"]
    assert not get("resume")["pause"]
    assert get("checkpoint")["save_checkpoint"]
    assert chan.consume_checkpoint_request()
    assert get("stop")["stop"]
    chan.close()


def test_live_map_viewer(tmp_path):
    """FileGui.push with a map snapshot writes live.html + map.json; the
    JSON blob round-trips to the exact downsampled point cloud."""
    import base64

    import numpy as np

    from wildgs_slam_tpu.gui import FileGui, GaussianPacket

    gui = FileGui(str(tmp_path), http_port=12345)
    H, W, M = 12, 16, 500
    rng = np.random.RandomState(0)
    gui.push(GaussianPacket(
        frame_idx=3,
        gt_color=rng.rand(H, W, 3), rendered_color=rng.rand(H, W, 3),
        rendered_depth=rng.rand(H, W), traj_xyz=rng.rand(4, 3),
        window=[0, 1], n_gaussians=M,
        map_xyz=rng.rand(M, 3).astype(np.float32),
        map_rgb=rng.rand(M, 3).astype(np.float32),
        map_scale=rng.rand(M).astype(np.float32)))

    gdir = tmp_path / "gui"
    assert (gdir / "live.html").exists()
    live = (gdir / "live.html").read_text()
    assert "map.json" in live and "12345/pause" in live
    m = json.loads((gdir / "map.json").read_text())
    assert m["n"] == M and m["frame"] == 3
    pos = np.frombuffer(base64.b64decode(m["pos"]), np.float32)
    assert pos.shape == (3 * M,) and np.isfinite(pos).all()
    assert "live.html" in (gdir / "index.html").read_text()


def test_export_splat_viewer(tmp_path):
    """WebGL2 splat viewer export: real gaussian data packed (pos, rgb+op,
    cov6) with the EWA shader embedded (reference parity:
    src/gui/gl_render/render_ogl.py sort-and-blend GLSL)."""
    import numpy as np

    from wildgs_slam_tpu.gui.html_viewer import export_splat_viewer

    rng = np.random.RandomState(0)
    n = 500
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p = export_splat_viewer(
        str(tmp_path / "splat.html"), rng.randn(n, 3),
        rng.rand(n, 3), rng.rand(n), np.exp(rng.randn(n, 3) * 0.3) * 0.05,
        q)
    html = open(p).read()
    assert "gl_Position" in html and "drawArraysInstanced" in html
    assert f"const N={n};" in html
    import base64
    import re

    b64 = re.search(r'B64="([^"]+)"', html).group(1)
    f32 = np.frombuffer(base64.b64decode(b64), np.float32)
    assert f32.size == 13 * n  # 3 pos + 4 rgba + 6 cov
    assert np.isfinite(f32).all()


def test_export_viewer_from_map(tmp_path):
    import numpy as np

    from wildgs_slam_tpu.gui.html_viewer import export_viewer_from_map
    from wildgs_slam_tpu.slam import gaussian_map as gm

    m = gm.create(64, max_sh_degree=0)
    m = m._replace(aux=m.aux._replace(
        alive=m.aux.alive.at[:32].set(True)))
    out = export_viewer_from_map(str(tmp_path / "map_viewer.html"), m)
    assert out.endswith("map_viewer.html")
    import os
    assert os.path.exists(str(tmp_path / "map_viewer.html"))
    assert os.path.exists(str(tmp_path / "map_viewer_points.html"))
