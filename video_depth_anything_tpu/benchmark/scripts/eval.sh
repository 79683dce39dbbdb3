#!/bin/bash
# ~110-frame protocol (parity with benchmark/eval/eval.sh)
python -m video_depth_anything_tpu.benchmark.evaluate \
    --infer_path "${1:-./infer_out}" --benchmark_path "${2:-./benchmark_data}" \
    --datasets sintel scannet kitti bonn
