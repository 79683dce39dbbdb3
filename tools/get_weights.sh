#!/bin/bash
# Download the reference checkpoints (parity with get_weights.sh:1-6) and
# convert to the native .npz format. Requires network access.
set -e
mkdir -p checkpoints
cd checkpoints
wget -nc https://huggingface.co/depth-anything/Video-Depth-Anything-Small/resolve/main/video_depth_anything_vits.pth
wget -nc https://huggingface.co/depth-anything/Video-Depth-Anything-Large/resolve/main/video_depth_anything_vitl.pth
wget -nc https://huggingface.co/depth-anything/Metric-Video-Depth-Anything-Large/resolve/main/metric_video_depth_anything_vitl.pth
cd ..
for f in checkpoints/*.pth; do python tools/convert_checkpoint.py "$f"; done
