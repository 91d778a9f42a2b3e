"""File-based live GUI: PNG panels + auto-refreshing index page.

Plays the role of the reference's slam_gui process (src/gui/slam_gui.py):
the mapper emits GaussianPacket snapshots; here each packet becomes a set of
rendered panels on disk that a browser displays live.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>wildgs_slam_tpu live</title>
<meta http-equiv="refresh" content="2">
<style>body{background:#111;color:#eee;font-family:monospace}
img{max-width:46vw;margin:4px;border:1px solid #333}
button{background:#333;color:#eee;border:1px solid #666;margin:2px;
padding:4px 10px;cursor:pointer}</style></head>
<body><h3>wildgs_slam_tpu — live view (auto-refresh 2s)</h3>
{controls}
<div><img src="render.png?r={r}"><img src="depth.png?r={r}"></div>
<div><img src="uncertainty.png?r={r}"><img src="traj.png?r={r}"></div>
<p>{status}</p></body></html>
"""

_CONTROLS_HTTP = """<div>
<button onclick="fetch('http://127.0.0.1:{port}/pause')">pause</button>
<button onclick="fetch('http://127.0.0.1:{port}/resume')">resume</button>
<button onclick="fetch('http://127.0.0.1:{port}/checkpoint')">checkpoint</button>
<button onclick="fetch('http://127.0.0.1:{port}/stop')">stop</button>
</div>"""

_CONTROLS_FILE = ("<p>control: write {\"pause\": true} etc. to "
                  "gui/control.json</p>")


@dataclass
class GaussianPacket:
    """Snapshot handed from the mapper to the GUI (gui_utils.py:86-190)."""

    frame_idx: int
    gt_color: np.ndarray                       # (H, W, 3)
    rendered_color: np.ndarray                 # (H, W, 3)
    rendered_depth: np.ndarray                 # (H, W)
    uncertainty: Optional[np.ndarray] = None   # (h', w')
    traj_xyz: Optional[np.ndarray] = None      # (N, 3) keyframe centers
    window: list = field(default_factory=list)
    n_gaussians: int = 0
    # live 3D map snapshot (downsampled; drives gui/live.html)
    map_xyz: Optional[np.ndarray] = None       # (M, 3)
    map_rgb: Optional[np.ndarray] = None       # (M, 3) in [0,1]
    map_scale: Optional[np.ndarray] = None     # (M,)


class FileGui:
    def __init__(self, out_dir: str, http_port: Optional[int] = None):
        self.dir = os.path.join(out_dir, "gui")
        os.makedirs(self.dir, exist_ok=True)
        self._rev = 0
        self.http_port = http_port

    def push(self, pkt: GaussianPacket):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        def save_img(name, arr, cmap=None):
            fig, ax = plt.subplots(figsize=(6, 4.5))
            ax.imshow(np.clip(np.asarray(arr), 0, 1) if cmap is None
                      else np.asarray(arr), cmap=cmap)
            ax.set_xticks([]), ax.set_yticks([])
            fig.tight_layout(pad=0.1)
            fig.savefig(os.path.join(self.dir, name), dpi=90)
            plt.close(fig)

        side = np.concatenate([pkt.gt_color, pkt.rendered_color], axis=1)
        save_img("render.png", side)
        save_img("depth.png", pkt.rendered_depth, cmap="plasma")
        if pkt.uncertainty is not None:
            save_img("uncertainty.png", pkt.uncertainty, cmap="jet")
        if pkt.traj_xyz is not None and len(pkt.traj_xyz):
            fig, ax = plt.subplots(figsize=(6, 4.5))
            xyz = np.asarray(pkt.traj_xyz)
            ax.plot(xyz[:, 0], xyz[:, 2], "c.-", ms=3)
            ax.plot(xyz[-1, 0], xyz[-1, 2], "ro")
            ax.set_aspect("equal")
            ax.set_title("trajectory (top view)")
            fig.savefig(os.path.join(self.dir, "traj.png"), dpi=90)
            plt.close(fig)

        self._rev += 1
        if pkt.map_xyz is not None and len(pkt.map_xyz):
            from .html_viewer import map_snapshot_json, write_live_viewer

            live = os.path.join(self.dir, "live.html")
            if not os.path.exists(live):
                write_live_viewer(live, http_port=self.http_port)
            with open(os.path.join(self.dir, "map.json"), "w") as f:
                f.write(map_snapshot_json(pkt.map_xyz, pkt.map_rgb,
                                          pkt.map_scale, pkt.frame_idx,
                                          self._rev))
        status = (f"frame {pkt.frame_idx} · window {pkt.window} · "
                  f"{pkt.n_gaussians} gaussians · "
                  f"<a href='live.html' style='color:#6cf'>live 3D map</a>")
        controls = (_CONTROLS_HTTP.replace("{port}", str(self.http_port))
                    if self.http_port else _CONTROLS_FILE)
        with open(os.path.join(self.dir, "index.html"), "w") as f:
            f.write(_INDEX_HTML.replace("{r}", str(self._rev))
                    .replace("{status}", status)
                    .replace("{controls}", controls))
