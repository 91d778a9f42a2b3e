#!/bin/bash
# Run all Wild-SLAM mocap scenes (reference: scripts_run/run_wild_slam_mocap_all.sh).
set -e
SCENES=(ball crowd person_tracking racket stones table_tracking1
        table_tracking2 umbrella ANYmal1 ANYmal2)
for s in "${SCENES[@]}"; do
  echo "=== $s ==="
  python run.py "configs/Dynamic/Wild_SLAM_Mocap/${s}.yaml" "$@"
done
python scripts/summarize_pose_eval.py ./output/Wild_SLAM_Mocap
