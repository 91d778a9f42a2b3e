#!/usr/bin/env python
"""Diagnose per-frame recompiles in the tracking frontend (CPU, fast).

Runs motion-filter + frontend over N synthetic frames with
jax_log_compiles on, and reports how many XLA compiles EACH FRAME
triggers. On the tunneled TPU every compile costs minutes, so the frontend
is only viable if compiles converge to ZERO per frame after the first few.

Usage: python scripts/diag_frontend_compiles.py [--frames 20]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

import numpy as np

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.models import droid_net
from wildgs_slam_tpu.slam.backend import Backend
from wildgs_slam_tpu.slam.frontend import Frontend
from wildgs_slam_tpu.slam.motion_filter import MotionFilter
from wildgs_slam_tpu.slam.state import SlamState

HT, WD = 48, 64


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg:
            self.events.append(msg.split(" ")[1])


def synth_image(t):
    y, x = np.meshgrid(np.arange(HT), np.arange(WD), indexing="ij")
    img = np.stack([
        0.5 + 0.5 * np.sin(0.2 * (x - 3 * t)),
        0.5 + 0.5 * np.cos(0.15 * (y + 2 * t)),
        0.5 + 0.4 * np.sin(0.1 * (x + y - t)),
    ], -1).astype(np.float32)
    return np.clip(img, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=8)
    args = ap.parse_args()

    counter = CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)
    logging.getLogger("jax._src.dispatch").addHandler(counter)
    logging.getLogger("jax").addHandler(counter)
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch", "jax"):
        logging.getLogger(name).setLevel(logging.WARNING)
    jax.config.update("jax_log_compiles", True)

    cfg = load_config("configs/wildgs_slam.yaml")
    t = cfg["tracking"]
    t["buffer"] = args.frames + 5
    t["warmup"] = args.warmup
    t["frontend"].update(window=12, max_factors=48)
    t["backend"]["ba_freq"] = 10

    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr, buffer=t["buffer"])
    params = droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)

    mf = MotionFilter(state, params, thresh=-1.0,
                      depth_fn=lambda im: np.full((HT, WD), 2.0, np.float32))
    backend = Backend(state, params, cfg)
    fe = Frontend(state, params, cfg, backend=backend)

    from collections import Counter

    totals = Counter()
    for fr in range(args.frames):
        n0 = len(counter.events)
        mf.track(float(fr), synth_image(fr))
        fe()
        new = counter.events[n0:]
        names = Counter(new)
        print(f"frame {fr:3d}: {len(new):3d} compiles"
              + ("" if not new else "  " + ", ".join(
                  f"{k}x{v}" for k, v in names.most_common(8))),
              flush=True)
        if fr >= args.frames - 5:
            totals.update(new)
    print("\nlast-5-frame compile totals:", dict(totals) or "NONE (good)")


if __name__ == "__main__":
    main()
