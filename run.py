#!/usr/bin/env python
"""CLI entry: python run.py configs/Dynamic/TUM_RGBD/freiburg3_walking_xyz.yaml

Port of the reference's run.py:20-52 (same single-positional-config CLI).
"""

import argparse
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wildgs_slam_tpu.utils.jax_setup import setup_compile_cache

setup_compile_cache()


def setup_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="path to config yaml")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--fast_mode", action="store_true")
    parser.add_argument("--trace_dir", type=str, default=None,
                        help="capture a jax.profiler (xplane) trace of the "
                             "whole run into this directory")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in the "
                             "output directory")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="save a resumable checkpoint every N keyframes "
                             "(0 = disabled)")
    parser.add_argument("--debug", action="store_true",
                        help="detect-anomaly mode: jax_debug_nans + finite "
                             "checks at every phase boundary")
    parser.add_argument("--mesh", type=int, default=None,
                        help="run the system over an N-device mesh "
                             "(edge-sharded tracking + gaussian-sharded "
                             "mapping); equals cfg parallel.n_devices")
    args = parser.parse_args()

    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.slam.system import SLAM
    from wildgs_slam_tpu.utils.datasets import get_dataset

    cfg = load_config(args.config)
    if args.max_frames is not None:
        cfg["max_frames"] = args.max_frames
    if args.fast_mode:
        cfg["fast_mode"] = True
    if args.mesh is not None:
        cfg.setdefault("parallel", {})["n_devices"] = args.mesh
    setup_seed(cfg.get("setup_seed", 43))

    if "scene" not in cfg:
        cfg["scene"] = os.path.splitext(os.path.basename(args.config))[0]
    output_dir = os.path.join(cfg["data"]["output"], str(cfg["scene"]))
    os.makedirs(output_dir, exist_ok=True)

    stream = get_dataset(cfg)
    print(f"[run] {len(stream)} frames from {cfg['dataset']}")

    # mono priors (optional heavyweight nets; fall back to None => tracking
    # runs without metric-depth regularization)
    depth_fn = feat_fn = None
    try:
        from wildgs_slam_tpu.models.priors import make_prior_fns
        depth_fn, feat_fn = make_prior_fns(cfg, output_dir)
    except Exception as e:
        print(f"[run] mono priors unavailable ({e}); disabling depth reg")
        cfg["tracking"]["backend"]["metric_depth_reg"] = False
        cfg["tracking"]["uncertainty_params"]["activate"] = False
        cfg["mapping"]["uncertainty_params"]["activate"] = False

    if args.checkpoint_every:
        cfg["checkpoint_every"] = args.checkpoint_every
    if args.debug:
        cfg.setdefault("debug", {})["detect_anomaly"] = True
    resume_path = None
    if args.resume:
        resume_path = os.path.join(output_dir, "checkpoint.npz")
        if not os.path.exists(resume_path):
            print(f"[run] --resume: no checkpoint at {resume_path}; "
                  "starting fresh")
            resume_path = None

    from wildgs_slam_tpu.utils.profiling import trace

    t0 = time.time()
    slam = SLAM(cfg, stream, depth_fn=depth_fn, feat_fn=feat_fn)
    with trace(args.trace_dir):
        slam.run(resume_path=resume_path)
    print(f"[run] total wall time: {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
