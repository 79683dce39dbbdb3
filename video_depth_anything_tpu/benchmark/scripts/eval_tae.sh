#!/bin/bash
# scannet TAE protocol (parity with benchmark/eval/eval_tae.sh)
python -m video_depth_anything_tpu.benchmark.tae \
    --infer_path "${1:-./infer_out}" --benchmark_path "${2:-./benchmark_data}" \
    --datasets scannet --start_idx 10 --end_idx 180 --eval_scenes_num 20
