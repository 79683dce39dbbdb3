#!/bin/bash
# 500-frame protocol (parity with benchmark/eval/eval_500.sh)
python -m video_depth_anything_tpu.benchmark.evaluate \
    --infer_path "${1:-./infer_out}" --benchmark_path "${2:-./benchmark_data}" \
    --datasets scannet_500 kitti_500 bonn_500 nyuv2_500
