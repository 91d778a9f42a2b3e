#!/usr/bin/env python
"""Aggregate per-scene ATE metrics into a CSV (port of the reference's
scripts_run/summarize_pose_eval.py: RMSE in cm per scene + average)."""

import argparse
import glob
import os

import numpy as np


def read_metrics(path):
    out = {}
    for line in open(path):
        if ":" in line:
            k, v = line.split(":", 1)
            try:
                out[k.strip()] = float(v)
            except ValueError:
                pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_root", help="e.g. ./output/wildgs_slam")
    ap.add_argument("--metric_file", default="traj/full_traj_metrics.txt")
    ap.add_argument("--out_csv", default=None)
    args = ap.parse_args()

    rows = []
    for scene_dir in sorted(glob.glob(os.path.join(args.output_root, "*"))):
        mpath = os.path.join(scene_dir, args.metric_file)
        if not os.path.exists(mpath):
            continue
        m = read_metrics(mpath)
        if "rmse" in m:
            rows.append((os.path.basename(scene_dir), m["rmse"] * 100))

    if not rows:
        print("no metrics found")
        return

    csv = "scene,ate_rmse_cm\n"
    for name, rmse in rows:
        csv += f"{name},{rmse:.2f}\n"
    csv += f"average,{np.mean([r for _, r in rows]):.2f}\n"
    out = args.out_csv or os.path.join(args.output_root, "pose_eval.csv")
    with open(out, "w") as f:
        f.write(csv)
    print(csv)
    print(f"written to {out}")


if __name__ == "__main__":
    main()
