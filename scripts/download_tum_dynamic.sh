#!/bin/bash
# Download TUM-dynamic sequences (reference: scripts_downloading/).
set -e
mkdir -p datasets/TUM_RGBD && cd datasets/TUM_RGBD
BASE=https://cvg.cit.tum.de/rgbd/dataset
for seq in freiburg2/rgbd_dataset_freiburg2_desk_with_person \
           freiburg3/rgbd_dataset_freiburg3_sitting_xyz \
           freiburg3/rgbd_dataset_freiburg3_sitting_halfsphere \
           freiburg3/rgbd_dataset_freiburg3_sitting_rpy \
           freiburg3/rgbd_dataset_freiburg3_walking_xyz \
           freiburg3/rgbd_dataset_freiburg3_walking_halfsphere \
           freiburg3/rgbd_dataset_freiburg3_walking_rpy; do
  name=$(basename "$seq")
  [ -d "$name" ] && continue
  wget -c "$BASE/$seq.tgz" && tar -xzf "$name.tgz" && rm "$name.tgz"
done
