#!/usr/bin/env python3
"""Metric depth -> per-frame PLY point clouds.

Parity with metric_depth/depth_to_pointcloud.py:33-68 (same flags incl.
--focal-length-x/y; PLY written natively, see utils/pointcloud.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Video Depth Anything (TPU)")
    parser.add_argument("--input_video", type=str,
                        default="../assets/example_videos/davis_rollercoaster.mp4")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--max_res", type=int, default=1280)
    parser.add_argument("--encoder", type=str, default="vitl")
    parser.add_argument("--max_len", type=int, default=-1)
    parser.add_argument("--target_fps", type=int, default=-1)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--focal-length-x", default=470.4, type=float,
                        help="Focal length along the x-axis.")
    parser.add_argument("--focal-length-y", default=470.4, type=float,
                        help="Focal length along the y-axis.")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--random_init", action="store_true")
    args = parser.parse_args()

    import jax

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.utils import params_io
    from video_depth_anything_tpu.utils.pointcloud import unproject_depth, write_ply
    from video_depth_anything_tpu.utils.video_io import read_video_frames

    cfg = get_model_config(args.encoder, metric=True)
    ckpt = args.checkpoint or params_io.resolve_checkpoint(args.encoder, True)
    if ckpt:
        params = params_io.load_checkpoint(ckpt, cfg)
    elif args.random_init:
        params = init_params(jax.random.PRNGKey(0), cfg)
    else:
        sys.exit("no metric checkpoint found (use --checkpoint or --random_init)")

    frames, target_fps = read_video_frames(args.input_video, args.max_len,
                                           args.target_fps, args.max_res)
    pipe = VideoDepthPipeline(cfg, params)
    depths, _ = pipe.infer_video_depth(frames, target_fps,
                                       input_size=args.input_size,
                                       fp32=args.fp32)
    os.makedirs(args.output_dir, exist_ok=True)
    for i, depth in enumerate(depths):
        points, colors = unproject_depth(depth, args.focal_length_x,
                                         args.focal_length_y, frames[i])
        write_ply(os.path.join(args.output_dir, f"point{i:04d}.ply"),
                  points, colors)
    print(f"wrote {len(depths)} PLY point clouds to {args.output_dir}")


if __name__ == "__main__":
    main()
