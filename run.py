#!/usr/bin/env python3
"""Video Depth Anything (TPU) — relative/metric depth CLI.

Flag parity with the reference CLI (run.py:23-34 and metric_depth/run.py,
whose missing --save_exr flag — a latent crash at metric_depth/run.py:62 —
is fixed here by defining it for both modes).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(description="Video Depth Anything (TPU)")
    parser.add_argument("--input_video", type=str,
                        default="./assets/example_videos/davis_rollercoaster.mp4")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--max_res", type=int, default=1280)
    parser.add_argument("--encoder", type=str, default="vitl",
                        choices=["vits", "vitb", "vitl", "vitg"],
                        help="vits/vitl have released VDA checkpoints; "
                             "vitb/vitg follow the DINOv2 factory surface "
                             "(reference dinov2.py:353-397)")
    parser.add_argument("--max_len", type=int, default=-1,
                        help="maximum number of input frames, -1 = no limit")
    parser.add_argument("--target_fps", type=int, default=-1,
                        help="target fps, -1 = original")
    parser.add_argument("--fp32", action="store_true",
                        help="infer in float32 (default bfloat16 on TPU)")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantized encoder matmuls (w8a8, "
                             "calibrated on the first window; ops/quant.py). "
                             "Scales persist as <checkpoint>.int8calib.npz "
                             "so calibration runs once per checkpoint")
    parser.add_argument("--grayscale", action="store_true",
                        help="no color palette in the depth video")
    parser.add_argument("--save_npz", action="store_true")
    parser.add_argument("--save_exr", action="store_true")
    parser.add_argument("--metric", action="store_true",
                        help="metric-depth model (identity window stitching)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help=".npz (native) or .pth (torch) checkpoint; "
                             "defaults to ./checkpoints/ reference layout")
    parser.add_argument("--random_init", action="store_true",
                        help="random weights (smoke testing without a checkpoint)")
    parser.add_argument("--windows_per_batch", type=int, default=1)
    parser.add_argument("--streaming", action="store_true",
                        help="bounded-memory mode: a background thread "
                             "decodes frames overlapping device compute, "
                             "_src.mp4 encodes incrementally, and depth "
                             "chunks spill to a disk spool with exact "
                             "running min/max — host RAM stays O(window) "
                             "frames + O(chunk) depths; outputs are "
                             "bit-identical to the batch path")
    parser.add_argument("--transfer_fp16", action="store_true",
                        help="half-precision depth TRANSPORT (not compute): "
                             "stitched depths cross device->host as fp16 "
                             "(half the download bytes / multi-host "
                             "allgather); outputs are still fp32 with "
                             "2^-11-relative readout rounding")
    parser.add_argument("--compile_cache", type=str, nargs="?", const="",
                        default=None, metavar="DIR",
                        help="persist XLA-compiled programs to DIR (default "
                             "~/.cache/video_depth_anything_tpu/xla) so "
                             "repeat runs skip the ~20-40s window compile; "
                             "also enabled via VDA_COMPILE_CACHE")
    parser.add_argument("--decode_backend", type=str, default=None,
                        choices=["cv2", "ffmpeg"],
                        help="video decode backend (default cv2, or "
                             "VDA_DECODE_BACKEND). ffmpeg = decord-class "
                             "raw-pipe subprocess decode; max_res output "
                             "identical, full-res yuv->rgb may differ by "
                             "+-1/255 on a few pixels")
    args = parser.parse_args()

    from video_depth_anything_tpu.utils.platform_env import (
        backend_unreachable_retry, honor_jax_platforms_env)
    honor_jax_platforms_env()
    # Fail fast instead of hanging forever when the device tunnel is dead
    # or the remote executor is wedged (VDA_DEVICE_TIMEOUT seconds, 0 =
    # skip). A user-facing CLI should give up in ~1.5 min, not 10 (the
    # long default stays on bench.py, where losing a round's record is
    # worse than waiting); the budget is spent as 3 probe slices so a
    # wedge that clears mid-budget still proceeds.
    probe_s = float(os.environ.get("VDA_DEVICE_TIMEOUT", "90"))
    if probe_s > 0:
        err = backend_unreachable_retry(probe_s)
        if err is not None:
            # The probe thread is still wedged inside the backend RPC;
            # normal interpreter shutdown (sys.exit) can block on JAX
            # atexit teardown against the dead backend — hard-exit like
            # bench.py (round-4 advisor finding).
            print(f"accelerator backend unavailable: {err}\n"
                  "(set VDA_DEVICE_TIMEOUT to adjust the probe budget, "
                  "0 to skip)", file=sys.stderr, flush=True)
            os._exit(1)

    import jax

    from video_depth_anything_tpu.utils import compile_cache
    if args.compile_cache is not None:
        print("compilation cache:",
              compile_cache.enable_compile_cache(args.compile_cache or None))
    else:
        compile_cache.maybe_enable_from_env()

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.utils import params_io
    from video_depth_anything_tpu.utils.video_io import read_video_frames, save_video

    cfg = get_model_config(args.encoder, metric=args.metric)

    ckpt = args.checkpoint or params_io.resolve_checkpoint(args.encoder, args.metric)
    if ckpt is not None:
        print(f"loading checkpoint: {ckpt}")
        params = params_io.load_checkpoint(ckpt, cfg)
    elif args.random_init:
        print("WARNING: --random_init — outputs are not meaningful depth")
        params = init_params(jax.random.PRNGKey(0), cfg)
    else:
        sys.exit("no checkpoint found (use --checkpoint or --random_init); "
                 "expected ./checkpoints/video_depth_anything_{vits,vitl}.{npz,pth}")

    # int8 calibration scales persist next to the checkpoint so the
    # calibration forward runs once per checkpoint, not once per session.
    calib_path = (ckpt + ".int8calib.npz") if (args.int8 and ckpt) else None
    pipe = VideoDepthPipeline(cfg, params,
                              quant="int8" if args.int8 else None,
                              calib_path=calib_path,
                              transfer_fp16=args.transfer_fp16)
    os.makedirs(args.output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input_video))[0]
    if args.streaming:
        from video_depth_anything_tpu.utils.video_io import (
            DepthSpool, IncrementalVideoWriter, stream_video_frames)
        it, fps, hw = stream_video_frames(
            args.input_video, args.max_len, args.target_fps, args.max_res,
            decode_backend=args.decode_backend)
        # _src.mp4 is written as frames stream by — they never accumulate.
        src_writer = IncrementalVideoWriter(
            os.path.join(args.output_dir, stem + "_src.mp4"), fps)

        def tee(gen):
            with src_writer:
                for f in gen:
                    src_writer.append(f)
                    yield f

        print(f"streaming {hw[0]}x{hw[1]} @ {fps:.2f} fps, "
              f"backend={jax.default_backend()}")
        # Depth chunks spill to a raw file with exact running min/max, so
        # host RAM stays O(window) frames + O(chunk) depths end to end; the
        # writers below stream from the read-only memmap (bit-identical
        # outputs — same global normalization).
        spool = DepthSpool(os.path.join(args.output_dir,
                                        stem + "_depths.spool.f32"))
        try:
            for chunk in pipe.infer_video_depth_streaming(
                    tee(it), input_size=args.input_size, fp32=args.fp32):
                spool.append(chunk)
            if spool.count == 0:  # container opened, no frame ever decoded
                raise ValueError(f"no frames decoded from {args.input_video}")
        except BaseException:
            # Don't leak a multi-GB spill file if inference dies mid-video
            # (cleanup is idempotent; the finally below covers success).
            spool.cleanup()
            raise
        depths = spool.finish()
        depth_range = (spool.min, spool.max)
        frames = None
    else:
        spool = None
        depth_range = None
        frames, target_fps = read_video_frames(
            args.input_video, args.max_len, args.target_fps, args.max_res,
            decode_backend=args.decode_backend)
        print(f"{frames.shape[0]} frames @ {target_fps:.2f} fps, "
              f"{frames.shape[1]}x{frames.shape[2]}, "
              f"backend={jax.default_backend()}")
        depths, fps = pipe.infer_video_depth(
            frames, target_fps, input_size=args.input_size, fp32=args.fp32,
            windows_per_batch=args.windows_per_batch)

    import numpy as np
    try:
        if frames is not None:  # streaming already wrote _src.mp4 incrementally
            save_video(frames, os.path.join(args.output_dir, stem + "_src.mp4"),
                       fps=fps)
        vis_path = os.path.join(args.output_dir, stem + "_vis.mp4")
        if depth_range is not None:  # stream blocks from the spool memmap
            from video_depth_anything_tpu.utils.video_io import (
                save_depth_video_streamed)
            save_depth_video_streamed(depths, vis_path, fps, depth_range,
                                      grayscale=args.grayscale)
        else:
            save_video(depths, vis_path, fps=fps, is_depths=True,
                       grayscale=args.grayscale)
        print(f"wrote {args.output_dir}/{stem}_src.mp4 and _vis.mp4")

        if args.save_npz:
            # np.savez streams a contiguous memmap through the zip writer in
            # ~16 MB buffers — no full materialization in streaming mode.
            np.savez_compressed(
                os.path.join(args.output_dir, stem + "_depths.npz"),
                depths=depths)
            print(f"wrote {stem}_depths.npz")
        if args.save_exr:
            from video_depth_anything_tpu.utils.exr import write_exr_batch
            exr_dir = os.path.join(args.output_dir, stem + "_depths_exr")
            os.makedirs(exr_dir, exist_ok=True)
            paths = [os.path.join(exr_dir, f"frame_{i:05d}.exr")
                     for i in range(len(depths))]
            # Chunked: write_exr_batch materializes its input (native call),
            # so hand it O(chunk) slices when depths is the spool memmap.
            step = 64 if depth_range is not None else len(depths)
            for i in range(0, len(depths), max(step, 1)):
                write_exr_batch(paths[i:i + step], depths[i:i + step],
                                compression="zip")
            print(f"wrote {len(depths)} EXR frames to {exr_dir}")
    finally:
        if spool is not None:
            del depths  # release the memmap before removing its file
            spool.cleanup()


if __name__ == "__main__":
    main()
