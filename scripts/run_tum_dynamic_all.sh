#!/bin/bash
# Run all TUM-dynamic scenes (reference: scripts_run/run_tum_dynamic_all.sh).
set -e
SCENES=(freiburg2_desk_with_person freiburg3_sitting_halfsphere
        freiburg3_sitting_rpy freiburg3_sitting_xyz
        freiburg3_walking_halfsphere freiburg3_walking_rpy
        freiburg3_walking_xyz freiburg3_sitting_halfsphere_static
        freiburg3_walking_halfsphere_static)
for s in "${SCENES[@]}"; do
  echo "=== $s ==="
  python run.py "configs/Dynamic/TUM_RGBD/${s}.yaml" "$@"
done
python scripts/summarize_pose_eval.py ./output/TUM_RGBD
