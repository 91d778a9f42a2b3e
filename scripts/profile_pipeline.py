#!/usr/bin/env python
"""Warm steady-state full-pipeline TPU profiling (feeds PERF.md).

Runs the complete SLAM system (tracking + mapping + final pipeline) on a
synthetic TUM-format scene at a chosen resolution and prints the per-phase
timing table from utils/profiling.py — first call (compile) vs warm mean.
This answers "is the SLAM loop TPU-viable end-to-end", not just the
rasterizer microbench (bench.py).

Usage: python scripts/profile_pipeline.py [--h 384 --w 512 --frames 25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize imports jax at interpreter start, so env vars are too late
# (CLAUDE.md); configure the persistent compile cache via jax.config
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def make_tum_scene(root, n, H, W):
    import cv2

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    yy, xx = np.meshgrid(np.arange(H * 2), np.arange(W * 2), indexing="ij")
    for i in range(n):
        t = 100.0 + i * 0.1
        img = np.stack([
            128 + 100 * np.sin(0.05 * (xx - 4 * i)),
            128 + 100 * np.cos(0.04 * (yy + 3 * i)),
            128 + 80 * np.sin(0.03 * (xx + yy - 2 * i)),
        ], -1).clip(0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), img)
        depth = ((2.0 + 0.5 * np.sin(0.01 * xx) * np.cos(0.01 * yy))
                 * 5000).astype(np.uint16)
        cv2.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} {0.05 * i} 0 0 0 0 0 1")
    hdr = "# h\n# h\n# h\n"
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(root, name), "w") as f:
            f.write(hdr + "\n".join(lines))


class _ProgressStream:
    """Dataset proxy printing a heartbeat per frame access, so long remote
    compiles are visible in the log."""

    def __init__(self, stream):
        self._s = stream
        self.t0 = time.time()

    def __len__(self):
        return len(self._s)

    def __getitem__(self, i):
        hbm = ""
        try:
            st = jax.devices()[0].memory_stats()
            hbm = (f"  hbm {st['bytes_in_use'] / 2**30:.2f}"
                   f"/{st['bytes_limit'] / 2**30:.1f}GB"
                   f" peak {st.get('peak_bytes_in_use', 0) / 2**30:.2f}GB")
        except Exception:
            pass
        print(f"[profile] frame {i} +{time.time() - self.t0:.0f}s{hbm}",
              flush=True)
        return self._s[i]

    def __getattr__(self, name):
        return getattr(self._s, name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--out", type=str, default="/tmp/profile_pipeline")
    ap.add_argument("--mapping_iters", type=int, default=60,
                    help="mapping iters per keyframe (450 in the reference "
                         "config; lower keeps the profile run bounded — "
                         "per-iteration warm cost is what we measure)")
    ap.add_argument("--init_iters", type=int, default=128)
    ap.add_argument("--final_refine", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--fast_mode", action="store_true",
                    help="skip the per-frame render-based non-keyframe pose "
                         "refinement in the final eval (reference fast_mode)")
    args = ap.parse_args()

    import jax

    print(f"[profile] backend={jax.default_backend()} "
          f"devices={jax.devices()}", flush=True)

    H, W = args.h, args.w
    root = os.path.join(args.out, "tum")
    if not os.path.exists(os.path.join(root, "rgb.txt")):
        make_tum_scene(root, n=args.frames, H=H, W=W)

    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.slam.system import SLAM
    from wildgs_slam_tpu.utils.datasets import get_dataset
    from wildgs_slam_tpu.utils.profiling import TIMER

    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["scene"] = "profile"
    if args.fast_mode:
        cfg["fast_mode"] = True
    cfg["dataset"] = "tumrgbd"
    cfg["data"]["input_folder"] = root
    cfg["data"]["output"] = os.path.join(args.out, "out")
    cfg["cam"].update(H=H * 2, W=W * 2, fx=W * 1.2, fy=W * 1.2, cx=W * 1.0,
                      cy=H * 1.0, H_out=H, W_out=W, H_edge=0, W_edge=0)
    t = cfg["tracking"]
    t["buffer"] = args.frames + 5
    t["warmup"] = 8
    t["force_keyframe_every_n_frames"] = 1
    t["motion_filter"]["thresh"] = 1e9
    t["frontend"].update(window=12, max_factors=48)
    t["backend"]["ba_freq"] = 10         # exercise online global BA
    m = cfg["mapping"]
    m["final_refine_iters"] = args.final_refine
    m["gaussian_capacity"] = args.capacity
    # 512/tile keeps the pallas bwd inside the 16MB scoped-VMEM limit (the
    # statically-unrolled chunk loop's stack grows with K/chunk; K=2048
    # overflows by 37KB at 384x512)
    m["render_list_capacity"] = 512
    m["Training"].update(init_itr_num=args.init_iters,
                         mapping_itr_num=args.mapping_iters,
                         window_size=8)

    rng = np.random.RandomState(0)
    fh, fw = H // 14, W // 14
    feats = rng.rand(8, fh, fw, 384).astype(np.float32)

    def depth_fn(im):
        return np.full((H, W), 2.0, np.float32)

    def feat_fn(im):
        return feats[int(np.asarray(im).sum() * 1e3) % 8]

    stream = _ProgressStream(get_dataset(cfg))
    t0 = time.time()
    slam = SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn)
    slam.run()
    wall = time.time() - t0

    print(f"\n[profile] {H}x{W}, {args.frames} frames, wall {wall:.1f}s")
    print(TIMER.report())
    summary = TIMER.summary()
    summary["_meta"] = {"H": H, "W": W, "frames": args.frames,
                        "wall_s": wall,
                        "mapping_iters": args.mapping_iters,
                        "backend": jax.default_backend()}
    path = os.path.join(args.out, "profile_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[profile] wrote {path}")


if __name__ == "__main__":
    main()
