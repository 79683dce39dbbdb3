"""End-to-end benchmark-harness rehearsal on a synthetic dataset.

The pieces (extractors, manifests, infer, evaluate, TAE) are individually
parity-tested in test_benchmark*.py, but the reference's actual workflow —
raw dataset -> extract -> JSON manifests -> batch inference -> geometric
eval -> TAE -> results.txt (SURVEY.md §2.5, benchmark/eval/eval.sh +
eval_tae.sh) — is what real weights will run first. This drives the whole
chain once over a synthetic scannet-layout fixture (VERDICT r3 item 7).
"""
import json
import os
import os.path as osp

import numpy as np
import pytest

from video_depth_anything_tpu.benchmark import evaluate, infer, tae
from video_depth_anything_tpu.benchmark.extract import extract_scannet
from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.pipeline import VideoDepthPipeline

N_FRAMES = 6
RAW_H, RAW_W = 64, 80  # crops to 48x58 under scannet's 8:-8, 11:-11


@pytest.fixture(scope="module")
def synthetic_scannet(tmp_path_factory):
    """Raw scannet layout: color/*.jpg, depth/*.png (16-bit mm),
    pose/*.txt, intrinsic/intrinsic_depth.txt."""
    import cv2

    root = tmp_path_factory.mktemp("scannet_raw")
    seq = root / "scene0000_00"
    (seq / "color").mkdir(parents=True)
    (seq / "depth").mkdir()
    (seq / "pose").mkdir()
    (seq / "intrinsic").mkdir()
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:RAW_H, 0:RAW_W]
    for i in range(N_FRAMES):
        img = rng.integers(0, 256, (RAW_H, RAW_W, 3), np.uint8)
        cv2.imwrite(str(seq / "color" / f"{i:06d}.jpg"), img)
        # smooth mm depth ramp, 500..4500mm, shifting per frame
        depth_mm = (500 + 50 * (yy + xx) / 2 + 100 * i).astype(np.uint16)
        cv2.imwrite(str(seq / "depth" / f"{i:06d}.png"), depth_mm)
        pose = np.eye(4)
        pose[:3, 3] = [0.01 * i, 0.0, 0.02 * i]  # small camera translation
        np.savetxt(str(seq / "pose" / f"{i:06d}.txt"), pose)
    k = np.eye(4)
    k[0, 0] = k[1, 1] = 60.0
    k[0, 2], k[1, 2] = RAW_W / 2, RAW_H / 2
    np.savetxt(str(seq / "intrinsic" / "intrinsic_depth.txt"), k)
    return root


def test_benchmark_chain_end_to_end(synthetic_scannet, tmp_path):
    bench = tmp_path / "benchmark_data"
    infer_out = tmp_path / "infer_out"

    # 1. extract: crop/copy + write scannet_video{,_500,_tae}.json
    extract_scannet(str(synthetic_scannet), str(bench))
    out = bench / "scannet"
    assert (out / "scannet_video.json").exists()
    assert (out / "scannet_video_tae.json").exists()
    with open(out / "scannet_video_tae.json") as f:
        tae_manifest = json.load(f)
    entries = next(iter(tae_manifest["scannet"][0].values()))
    assert len(entries) == N_FRAMES
    assert "K" in entries[0] and "pose" in entries[0]

    # 2. batch inference over BOTH manifests (eval uses the cropped color
    #    tree; TAE the uncropped color_origin tree) with a tiny model
    cfg = ModelConfig(
        encoder="_tinybench",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32), num_frames=32,
        taps=(0, 0, 1, 1))
    pipe = VideoDepthPipeline(cfg, init_params(0, cfg), use_pallas=False)
    n = infer.infer_manifest(pipe, str(out / "scannet_video.json"),
                             "scannet", str(infer_out), input_size=28)
    assert n == 1
    n = infer.infer_manifest(pipe, str(out / "scannet_video_tae.json"),
                             "scannet", str(infer_out), input_size=28)
    assert n == 1
    npys = [p for p, _, fs in os.walk(infer_out) for f in fs
            if f.endswith(".npy")]
    assert npys, "no predictions written"

    # 3. geometric eval driver (writes results.txt)
    evaluate.main(["--infer_path", str(infer_out),
                   "--benchmark_path", str(bench),
                   "--datasets", "scannet"])
    results = infer_out / "results.txt"
    assert results.exists()
    text = results.read_text()
    assert "scannet" in text and "abs_rel" in text
    absrel = float([ln for ln in text.splitlines()
                    if ln.startswith("abs_rel")][0].split(":")[1])
    assert np.isfinite(absrel) and absrel >= 0

    # 4. TAE driver (appends to results.txt; picks the _tae manifest)
    tae.main(["--infer_path", str(infer_out),
              "--benchmark_path", str(bench),
              "--datasets", "scannet", "--start_idx", "0",
              "--end_idx", str(N_FRAMES)])
    text = results.read_text()
    tae_line = [ln for ln in text.splitlines()
                if ln.startswith("scannet:")][-1]
    tae_val = float(tae_line.split(":")[1])
    assert np.isfinite(tae_val) and tae_val >= 0
