"""End-to-end benchmark loop: manifest -> batch inference -> geometric eval."""
import json
import os

import numpy as np

from video_depth_anything_tpu.benchmark import evaluate, infer, manifests
from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.pipeline import VideoDepthPipeline


def test_infer_manifest_to_eval(tmp_path):
    import cv2

    # Synthetic "bonn" dataset: 1 sequence, 4 frames.
    root = tmp_path / "bonn"
    rng = np.random.default_rng(0)
    (root / "seq" / "rgb").mkdir(parents=True)
    (root / "seq" / "depth").mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 255, (42, 56, 3), np.uint8)
        cv2.imwrite(str(root / "seq" / "rgb" / f"{i:04d}.png"), img)
        d16 = rng.integers(5000, 50000, (42, 56)).astype(np.uint16)
        cv2.imwrite(str(root / "seq" / "depth" / f"{i:04d}.png"), d16)
    json_file = str(root / "bonn_video.json")
    manifests.gen_json(str(root), "bonn", save_path=json_file)

    cfg = ModelConfig(
        encoder="_tinybench",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=32,
                      taps=(0, 0, 1, 1))
    pipe = VideoDepthPipeline(cfg, init_params(0, cfg), use_pallas=False)

    infer_dir = str(tmp_path / "out")
    n = infer.infer_manifest(pipe, json_file, "bonn", infer_dir, input_size=28)
    assert n == 1
    pred = np.load(os.path.join(infer_dir, "bonn", "seq", "rgb", "0000.npy"))
    assert pred.shape == (42, 56) and np.isfinite(pred).all()

    ecfg = evaluate.DatasetEvalConfig(
        json_file=json_file, root_path=str(root), max_depth_eval=10.0,
        min_depth_eval=0.1, max_eval_len=110, crop=(0, 42, 0, 56), name="bonn")
    res = evaluate.eval_dataset(infer_dir, ecfg)
    assert all(np.isfinite(v) for v in res.values())
    assert set(res) == {"abs_relative_difference", "rmse_linear", "delta1_acc"}
