#!/usr/bin/env python3
"""Gradio demo — parity with reference app.py:39-152.

ViT-L relative depth with max_len / target_fps / max_res sliders, returning
(processed source mp4, depth visualization mp4). Gradio is not baked into
this image; the app degrades to a clear install message while
`process_video` stays importable for programmatic use.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_PIPELINE = {}


def _get_pipeline(encoder="vitl"):
    if encoder not in _PIPELINE:
        import jax

        from video_depth_anything_tpu.config import get_model_config
        from video_depth_anything_tpu.models.video_depth import init_params
        from video_depth_anything_tpu.pipeline import VideoDepthPipeline
        from video_depth_anything_tpu.utils import params_io

        cfg = get_model_config(encoder)
        ckpt = params_io.resolve_checkpoint(encoder)
        if ckpt:
            params = params_io.load_checkpoint(ckpt, cfg)
        else:
            print("WARNING: no checkpoint found — using random weights")
            params = init_params(jax.random.PRNGKey(0), cfg)
        _PIPELINE[encoder] = VideoDepthPipeline(cfg, params)
    return _PIPELINE[encoder]


def process_video(video_path: str, max_len: int = 500, target_fps: int = 15,
                  max_res: int = 1280, output_dir: str = "./outputs",
                  grayscale: bool = False):
    """app.py:39-59 equivalent -> (src_video_path, vis_video_path)."""
    from video_depth_anything_tpu.utils.video_io import (read_video_frames,
                                                         save_video)

    pipe = _get_pipeline()
    frames, fps = read_video_frames(video_path, max_len, target_fps, max_res)
    depths, fps = pipe.infer_video_depth(frames, fps)
    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(video_path))[0]
    src = os.path.join(output_dir, stem + "_src.mp4")
    vis = os.path.join(output_dir, stem + "_vis.mp4")
    save_video(frames, src, fps=fps)
    save_video(depths, vis, fps=fps, is_depths=True, grayscale=grayscale)
    return src, vis


def construct_demo():
    import gradio as gr

    with gr.Blocks(title="Video Depth Anything (TPU)") as demo:
        gr.Markdown("# Video Depth Anything — TPU\nConsistent depth for "
                    "arbitrarily long videos.")
        with gr.Row():
            inp = gr.Video(label="Input video")
            out_src = gr.Video(label="Processed source")
            out_vis = gr.Video(label="Depth visualization")
        with gr.Row():
            max_len = gr.Slider(1, 1000, value=500, step=1, label="max length")
            fps = gr.Slider(-1, 60, value=15, step=1, label="target fps")
            max_res = gr.Slider(196, 1920, value=1280, step=14, label="max res")
        btn = gr.Button("Generate")
        btn.click(lambda v, l, f, r: process_video(v, int(l), int(f), int(r)),
                  inputs=[inp, max_len, fps, max_res],
                  outputs=[out_src, out_vis])
    return demo


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        sys.exit("gradio is not installed in this image; use run.py for the "
                 "CLI, or `pip install gradio` in a full environment")
    demo = construct_demo()
    demo.queue()
    demo.launch(share=True)
