#!/bin/bash
# Run all Bonn dynamic scenes.
set -e
SCENES=(bonn_balloon bonn_balloon2 bonn_crowd bonn_crowd2 bonn_crowd3
        bonn_moving_nonobstructing_box bonn_moving_nonobstructing_box2
        bonn_person_tracking bonn_person_tracking2)
for s in "${SCENES[@]}"; do
  echo "=== $s ==="
  python run.py "configs/Dynamic/Bonn/${s}.yaml" "$@"
done
python scripts/summarize_pose_eval.py ./output/Bonn
