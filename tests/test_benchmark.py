"""Benchmark harness parity vs the reference (metric.py / eval.py / eval_tae.py)."""
import importlib.util
import json
import os

import numpy as np
import pytest

from video_depth_anything_tpu.benchmark import evaluate, manifests, metrics, tae


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_metric():
    return _load_ref("ref_metric", "/root/reference/benchmark/eval/metric.py")


@pytest.fixture(scope="module")
def ref_tae():
    return _load_ref("ref_tae", "/root/reference/benchmark/eval/eval_tae.py")


@pytest.fixture(scope="module")
def depth_batch():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.5, 10.0, (4, 24, 32)).astype(np.float64)
    gt = rng.uniform(0.5, 10.0, (4, 24, 32)).astype(np.float64)
    mask = rng.random((4, 24, 32)) > 0.3
    return pred, gt, mask


ALL_METRICS = ["abs_relative_difference", "squared_relative_difference",
               "rmse_linear", "rmse_log", "log10", "delta1_acc", "delta2_acc",
               "delta3_acc", "i_rmse", "silog_rmse"]


@pytest.mark.parametrize("name", ALL_METRICS)
def test_metric_parity(ref_metric, depth_batch, name):
    import torch

    pred, gt, mask = depth_batch
    ref = getattr(ref_metric, name)(torch.from_numpy(pred), torch.from_numpy(gt),
                                    torch.from_numpy(mask)).item()
    got = getattr(metrics, name)(pred, gt, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_eval_sequence_matches_reference_math(depth_batch):
    """Replicates eval.py:87-122 in fp64 and compares end metrics."""
    rng = np.random.default_rng(1)
    gt = rng.uniform(1.0, 60.0, (6, 24, 32))
    disp_true = 1.0 / gt
    pred_disp = (2.5 * disp_true + 0.01
                 + 0.001 * rng.standard_normal(gt.shape)).astype(np.float32)
    max_depth = 70.0

    got = evaluate.eval_sequence(pred_disp.copy(), gt.copy(), max_depth)

    # Independent fp64 oracle of the protocol.
    valid = (gt > 1e-3) & (gt < max_depth)
    infs = np.clip(pred_disp, 1e-3, None)
    gt_disp = 1.0 / (gt[valid].reshape(-1, 1) + 1e-8)
    a = np.concatenate([infs[valid].reshape(-1, 1).astype(np.float64),
                        np.ones((valid.sum(), 1))], axis=1)
    scale, shift = np.linalg.lstsq(a, gt_disp, rcond=None)[0]
    aligned = np.clip(scale * infs + shift, 1e-3, None)
    depth = np.clip(1.0 / aligned, 1e-3, max_depth)
    exp_absrel = metrics.abs_relative_difference(depth, gt, valid)
    np.testing.assert_allclose(got[0], exp_absrel, rtol=1e-6)
    assert got[0] < 0.05  # near-affine disparity must align well
    assert got[2] > 0.95  # delta1


def test_tae_pair_parity(ref_tae):
    import torch

    rng = np.random.default_rng(2)
    h, w = 24, 32
    depth1 = rng.uniform(1.0, 5.0, (h, w))
    depth2 = rng.uniform(1.0, 5.0, (h, w))
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    angle = 0.05
    r = np.array([[np.cos(angle), 0, np.sin(angle)],
                  [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]])
    t = np.array([0.05, -0.02, 0.1])
    mask = np.ones((h, w), bool)

    ref = ref_tae.tae_torch(torch.from_numpy(depth1), torch.from_numpy(depth2),
                            torch.from_numpy(r), torch.from_numpy(t), k,
                            torch.from_numpy(mask))
    ref = float(ref) if not hasattr(ref, "item") else ref.item()
    got = tae.tae_pair(depth1, depth2, r, t, k, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_manifest_roundtrip(tmp_path):
    """gen_json layout -> eval_dataset consumes it end to end."""
    import cv2

    root = tmp_path / "bonn"
    rng = np.random.default_rng(3)
    for seq in ["seq_a", "seq_b"]:
        (root / seq / "rgb").mkdir(parents=True)
        (root / seq / "depth").mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (20, 30, 3), np.uint8)
            cv2.imwrite(str(root / seq / "rgb" / f"{i:04d}.png"), img)
            d16 = rng.integers(1000, 40000, (20, 30)).astype(np.uint16)
            cv2.imwrite(str(root / seq / "depth" / f"{i:04d}.png"), d16)

    mani = manifests.gen_json(str(root), "bonn",
                              save_path=str(root / "bonn_video.json"))
    assert len(mani["bonn"]) == 2
    assert len(mani["bonn"][0]["seq_a"]) == 4
    assert mani["bonn"][0]["seq_a"][0]["factor"] == 5000.0

    # Fake predictions: inverse of GT (perfect alignment up to clamps).
    infer_dir = tmp_path / "infer"
    for seq in mani["bonn"]:
        for name, frames in seq.items():
            for fr in frames:
                gt = evaluate.load_gt_depth(str(root / fr["gt_depth"]),
                                            fr["factor"])
                disp = np.where(gt > 0, 1.0 / np.maximum(gt, 1e-6), 0)
                out = infer_dir / "bonn" / fr["image"].replace(".png", ".npy")
                out.parent.mkdir(parents=True, exist_ok=True)
                np.save(out, disp.astype(np.float32))

    cfg = evaluate.DatasetEvalConfig(
        json_file=str(root / "bonn_video.json"), root_path=str(root),
        max_depth_eval=10.0, min_depth_eval=0.1, max_eval_len=110,
        crop=(0, 20, 0, 30), name="bonn")
    res = evaluate.eval_dataset(str(infer_dir), cfg,
                                results_file=str(tmp_path / "results.txt"))
    assert res["abs_relative_difference"] < 0.05
    assert res["delta1_acc"] > 0.95
    assert (tmp_path / "results.txt").exists()
