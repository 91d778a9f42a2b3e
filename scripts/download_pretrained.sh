#!/bin/bash
# Fetch the pretrained weights the framework converts to flax:
#   droid.pth (DROID-SLAM), DepthAnythingV2 metric, DINOv2 ViT-S/14.
set -e
mkdir -p pretrained && cd pretrained
wget -c https://github.com/princeton-vl/DROID-SLAM/releases/download/v1.0/droid.pth || \
  echo "fetch droid.pth manually (see DROID-SLAM releases)"
wget -c "https://huggingface.co/depth-anything/Depth-Anything-V2-Metric-Hypersim-Large/resolve/main/depth_anything_v2_metric_hypersim_vitl.pth" || true
wget -c "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_reg4_pretrain.pth" || true
wget -c "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth" || true
