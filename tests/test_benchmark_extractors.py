"""Execute every benchmark extractor on a synthetic raw-layout fixture.

test_benchmark_chain.py rehearses the full harness for scannet; the other
five extractors (kitti / bonn / sintel / nyuv2 / vkitti,
benchmark/extract.py:63-198, mirroring
benchmark/dataset_extract/dataset_extract_*.py) shipped tested by code
review only (VERDICT r4 weak #3) — yet they are the first thing real
weights need after scannet. Each test here builds the dataset's RAW
directory layout from scratch, runs its extract_*, and feeds the produced
manifest through batch inference + geometric eval to a finite abs_rel, so
every extractor's path conventions, crop, depth factor, and frame-budget
slicing execute in CI.

The sintel fixture writes the .dpt float-depth format byte-by-byte with an
independent struct-level writer, so `read_dpt` (extract.py:25-33, parity
with dataset_extract_sintel.py:26-44) is exercised against bytes it did
not produce itself.
"""
import os
import os.path as osp

import numpy as np
import pytest

from video_depth_anything_tpu.benchmark import evaluate, infer
from video_depth_anything_tpu.benchmark import extract
from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.pipeline import VideoDepthPipeline

RAW_H, RAW_W = 64, 80  # big enough to survive the nyuv2 45:/41: crop


@pytest.fixture(scope="module")
def pipe():
    cfg = ModelConfig(
        encoder="_tinyextract",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32), num_frames=32,
        taps=(0, 0, 1, 1))
    return VideoDepthPipeline(cfg, init_params(0, cfg), use_pallas=False)


def _write_rgb(path, rng):
    import cv2
    os.makedirs(osp.dirname(path), exist_ok=True)
    cv2.imwrite(path, rng.integers(0, 256, (RAW_H, RAW_W, 3), np.uint8))


def _write_depth16(path, raw_lo, raw_hi, i):
    """Smooth 16-bit depth ramp in [raw_lo, raw_hi] raw units."""
    import cv2
    os.makedirs(osp.dirname(path), exist_ok=True)
    yy, xx = np.mgrid[0:RAW_H, 0:RAW_W]
    ramp = (yy + xx) / (RAW_H + RAW_W - 2)
    d = raw_lo + (raw_hi - raw_lo) * (0.2 + 0.6 * ramp) + 10 * i
    cv2.imwrite(path, d.astype(np.uint16))


def _run_eval(pipe, bench_dir, dataset, manifest, infer_dir):
    n = infer.infer_manifest(pipe, str(manifest), dataset, str(infer_dir),
                             input_size=28)
    assert n >= 1
    evaluate.main(["--infer_path", str(infer_dir),
                   "--benchmark_path", str(bench_dir),
                   "--datasets", dataset])
    text = (infer_dir / "results.txt").read_text()
    assert dataset in text
    absrel = float([ln for ln in text.splitlines()
                    if ln.startswith("abs_rel")][0].split(":")[1])
    assert np.isfinite(absrel) and absrel >= 0


def test_kitti_extractor(pipe, tmp_path):
    """proj_depth/groundtruth layout + the {seq[:10]}/{seq} date nesting
    (dataset_extract_kitti.py:16-70); 16-bit mm*256 depth, even-dim crop."""
    rng = np.random.default_rng(0)
    root, depth_root = tmp_path / "raw", tmp_path / "depth_anno"
    seq = "2011_09_26_drive_0001_sync"
    for i in range(3):
        name = f"{i:010d}.png"
        _write_rgb(str(root / seq[:10] / seq / "image_02" / "data" / name),
                   rng)
        _write_depth16(str(depth_root / seq / "proj_depth" / "groundtruth"
                           / "image_02" / name), 256 * 2, 256 * 40, i)
    bench = tmp_path / "bench"
    extract.extract_kitti(str(root), str(depth_root), str(bench))
    out = bench / "kitti"
    assert (out / "kitti_video.json").exists()
    assert (out / "kitti_video_500.json").exists()
    # kitti/bonn crop: even dimensions only (eval_utils.py:120-139).
    import cv2
    got = cv2.imread(str(out / seq / "rgb" / "0000000000.png"))
    assert got.shape[:2] == (RAW_H - RAW_H % 2, RAW_W - RAW_W % 2)
    _run_eval(pipe, bench, "kitti", out / "kitti_video.json",
              tmp_path / "infer")


def test_bonn_extractor(pipe, tmp_path):
    """rgb/depth pair trees; the manifest's start_id=30 frame budget
    (extract.py:95) must leave entries for a 33-frame sequence."""
    rng = np.random.default_rng(1)
    root = tmp_path / "raw"
    seq = "rgbd_bonn_balloon"
    for i in range(33):
        name = f"frame_{i:04d}.png"
        _write_rgb(str(root / seq / "rgb" / name), rng)
        _write_depth16(str(root / seq / "depth" / name), 5000, 45000, i)
    bench = tmp_path / "bench"
    extract.extract_bonn(str(root), str(root), str(bench))
    out = bench / "bonn"
    import json
    with open(out / "bonn_video.json") as f:
        entries = next(iter(json.load(f)["bonn"][0].values()))
    assert len(entries) == 3  # frames 30..32 of 33 (start_id 30)
    _run_eval(pipe, bench, "bonn", out / "bonn_video.json",
              tmp_path / "infer")


def _dpt_bytes(depth: np.ndarray) -> bytes:
    """Independent .dpt writer (struct-level, dataset_extract_sintel.py
    format): float32 tag, int32 width, int32 height, row-major float32."""
    h, w = depth.shape
    return (np.asarray([202021.25], "<f4").tobytes()
            + np.asarray([w, h], "<i4").tobytes()
            + np.ascontiguousarray(depth, "<f4").tobytes())


def test_sintel_dpt_reader_roundtrip(tmp_path):
    depth = np.linspace(1.0, 60.0, RAW_H * RAW_W,
                        dtype=np.float32).reshape(RAW_H, RAW_W)
    p = tmp_path / "frame_0001.dpt"
    p.write_bytes(_dpt_bytes(depth))
    got = extract.read_dpt(str(p))
    np.testing.assert_array_equal(got, depth)
    # Corrupt tag must be rejected, not silently misparsed.
    bad = tmp_path / "bad.dpt"
    bad.write_bytes(np.asarray([1.0], "<f4").tobytes() + b"\0" * 16)
    with pytest.raises(AssertionError):
        extract.read_dpt(str(bad))


def test_sintel_extractor(pipe, tmp_path):
    """clean/*.png frames + .dpt float depth -> .npy (factor 65535/650)."""
    import cv2
    rng = np.random.default_rng(2)
    root, depth_root = tmp_path / "clean", tmp_path / "depth"
    seq = "alley_1"
    for i in range(3):
        _write_rgb(str(root / seq / f"frame_{i:04d}.png"), rng)
        d = (100.0 + 40.0 * rng.random((RAW_H, RAW_W)) + i).astype(np.float32)
        os.makedirs(depth_root / seq, exist_ok=True)
        (depth_root / seq / f"frame_{i:04d}.dpt").write_bytes(_dpt_bytes(d))
    bench = tmp_path / "bench"
    extract.extract_sintel(str(root), str(depth_root), str(bench))
    out = bench / "sintel"
    # .dpt -> .npy conversion landed next to the copied clean frames.
    npy = out / seq / "depth" / "frame_0000.npy"
    assert npy.exists() and np.load(npy).shape == (RAW_H, RAW_W)
    assert cv2.imread(str(out / seq / "clean" / "frame_0000.png")) is not None
    _run_eval(pipe, bench, "sintel", out / "sintel_video.json",
              tmp_path / "infer")


def test_nyuv2_extractor(pipe, tmp_path):
    """rgb/depth trees with the [45:471, 41:601] crop on rgb only (the
    eval-side crop re-applies it to the raw-copied GT)."""
    import cv2
    rng = np.random.default_rng(3)
    root = tmp_path / "raw"
    seq = "kitchen_0001"
    for i in range(3):
        _write_rgb(str(root / seq / "rgb" / f"img_{i:04d}.png"), rng)
        _write_depth16(str(root / seq / "depth" / f"img_{i:04d}.png"),
                       6000, 54000, i)
    bench = tmp_path / "bench"
    extract.extract_nyuv2(str(root), str(bench))
    out = bench / "nyuv2"
    got = cv2.imread(str(out / seq / "rgb" / "img_0000.png"))
    assert got.shape[:2] == (RAW_H - 45, RAW_W - 41)  # crop clamped to RAW
    _run_eval(pipe, bench, "nyuv2", out / "nyuv2_video.json",
              tmp_path / "infer")


def test_vkitti_extractor(pipe, tmp_path):
    """vkitti_2.0.3_{rgb,depth}/Scene20/{cond}/frames/{rgb,depth}/Camera_*
    nesting; cm depth at factor 100 (dataset_extract_vkitti.py:17-203)."""
    rng = np.random.default_rng(4)
    root = tmp_path / "raw"
    for cam in ("Camera_0", "Camera_1"):
        for i in range(3):
            _write_rgb(str(root / "vkitti_2.0.3_rgb" / "Scene20" / "clone"
                           / "frames" / "rgb" / cam / f"rgb_{i:05d}.jpg"),
                       rng)
            _write_depth16(str(root / "vkitti_2.0.3_depth" / "Scene20"
                               / "clone" / "frames" / "depth" / cam
                               / f"depth_{i:05d}.png"), 100 * 2, 100 * 70, i)
    bench = tmp_path / "bench"
    extract.extract_vkitti(str(root), str(bench))
    out = bench / "vkitti"
    assert (out / "Scene20_clone_Camera_0" / "rgb" / "rgb_00000.jpg").exists()
    assert (out / "Scene20_clone_Camera_1" / "depth"
            / "depth_00000.png").exists()
    _run_eval(pipe, bench, "vkitti", out / "vkitti_video.json",
              tmp_path / "infer")
