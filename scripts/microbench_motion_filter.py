#!/usr/bin/env python
"""Motion-filter per-frame cost at pipeline scale (VERDICT r4 item 5).

The motion filter runs EVERY frame (src/motion_filter.py:52-114), so its
per-frame wall time lower-bounds pipeline throughput. This drives
MotionFilter.track at 384x512 with synthetic priors and reports the
steady-state per-frame wall time + phase split (keyframes forced every 3
frames to mimic the reference cadence).

WILDGS_MF_FUSED=0 selects the legacy multi-dispatch path for A/B.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

HT = int(os.environ.get("MF_H", "384"))
WD = int(os.environ.get("MF_W", "512"))
N = int(os.environ.get("MF_FRAMES", "30"))
BUF = int(os.environ.get("MF_BUF", "64"))


def main():
    from wildgs_slam_tpu.models import droid_net
    from wildgs_slam_tpu.slam.motion_filter import MotionFilter
    from wildgs_slam_tpu.slam.state import SlamState
    from wildgs_slam_tpu.utils.profiling import TIMER

    print(f"[mf] backend={jax.default_backend()} {HT}x{WD} frames={N} "
          f"fused={os.environ.get('WILDGS_MF_FUSED', '1')}", flush=True)
    cfg = {}
    intr = np.array([260.0, 260.0, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr, buffer=BUF)
    params = droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)

    rng = np.random.RandomState(0)
    imgs = [rng.rand(HT, WD, 3).astype(np.float32) for _ in range(8)]
    depth_fn = lambda im: np.full((HT, WD), 2.0, np.float32)
    feat_fn = lambda im: rng.rand(HT // 14, WD // 14, 384).astype(np.float32)

    mf = MotionFilter(state, params, thresh=1e9,
                      force_keyframe_every_n_frames=3,
                      depth_fn=depth_fn, feat_fn=feat_fn)

    times = []
    for i in range(N):
        t0 = time.perf_counter()
        mf.track(float(i), imgs[i % len(imgs)])
        times.append(time.perf_counter() - t0)
    warm = times[6:]
    print(f"[mf] per-frame: mean {np.mean(warm)*1e3:.1f} ms  "
          f"p50 {np.percentile(warm, 50)*1e3:.1f}  "
          f"max {np.max(warm)*1e3:.1f}  (first {times[0]*1e3:.0f})",
          flush=True)
    print(TIMER.report(), flush=True)


if __name__ == "__main__":
    main()
