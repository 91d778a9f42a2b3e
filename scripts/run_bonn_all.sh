#!/bin/bash
# Run all Bonn dynamic scenes.
set -e
SCENES=(balloon balloon2 crowd crowd2 crowd3 moving_nonobstructing_box
        moving_nonobstructing_box2 person_tracking person_tracking2)
for s in "${SCENES[@]}"; do
  echo "=== $s ==="
  python run.py "configs/Dynamic/Bonn/${s}.yaml" "$@"
done
python scripts/summarize_pose_eval.py ./output/Bonn
