#!/usr/bin/env python3
"""Validate real checkpoints the moment they land in ./checkpoints/.

This image is network-blocked (tools/get_weights.sh cannot reach HF), so
real-weight accuracy cannot be produced here. This tool is the
validated-on-arrival path: as soon as a reference .pth (or converted .npz)
exists, one command runs the full chain and reports pass/fail:

  torch .pth -> converter (utils/torch_convert.py) -> .npz roundtrip
            -> VideoDepthPipeline forward on a synthetic video
            -> finite/positive output checks
            -> bf16-vs-fp32 drift vs the budget stated in
               tests/test_precision_budget.py (max 5% / mean 0.2% of range)
            -> optional: benchmark eval if --benchmark_json manifests exist

Usage:
  python tools/validate_checkpoint.py                       # scan ./checkpoints
  python tools/validate_checkpoint.py checkpoints/video_depth_anything_vitl.pth
  python tools/validate_checkpoint.py ckpt.npz --encoder vitl --video in.mp4
  python tools/validate_checkpoint.py ckpt.pth --benchmark_json m.json --infer_path out

Exit code 0 = all checks passed. Reference parity anchors:
get_weights.sh:1-6 (checkpoint set), run.py:46 (strict load contract),
benchmark/eval/eval.py:141-224 (eval protocol, via --benchmark_json).
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.utils.precision import (  # noqa: E402
    MAX_ERR_FRAC, MEAN_ERR_FRAC, synthetic_video)


def infer_encoder(path):
    for cand in ("vits", "vitb", "vitl", "vitg"):
        if cand in os.path.basename(path):
            return cand
    return None


def validate_one(path, encoder=None, video=None, input_size=None,
                 benchmark_json=None, infer_path=None):
    import numpy as np

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.utils import params_io
    from video_depth_anything_tpu.utils.precision import precision_drift_report

    report = {"checkpoint": path, "checks": {}, "ok": False}
    encoder = encoder or infer_encoder(path)
    if encoder is None:
        report["error"] = "cannot infer encoder from filename; pass --encoder"
        return report
    metric = "metric" in os.path.basename(path)
    try:
        cfg = get_model_config(encoder, metric=metric)
    except KeyError:
        from video_depth_anything_tpu.config import MODEL_CONFIGS
        report["error"] = (f"no model config for encoder '{encoder}' "
                           f"(supported: {', '.join(MODEL_CONFIGS)}); "
                           f"pass --encoder")
        return report
    report["encoder"], report["metric"] = encoder, metric

    # 1. load (.pth converts through utils/torch_convert; strict key contract)
    try:
        params = params_io.load_checkpoint(path, cfg)
        report["checks"]["load"] = "ok"
    except Exception as e:  # noqa: BLE001 — report, don't crash the scan
        report["checks"]["load"] = f"FAIL: {type(e).__name__}: {e}"
        return report

    # 2. converted .npz roundtrip (only when starting from .pth)
    if path.endswith(".pth"):
        try:
            import jax
            npz = os.path.splitext(path)[0] + ".npz"
            params_io.save_params(npz, params)
            re = params_io.load_params(npz)
            flat_a = jax.tree.leaves(params)
            flat_b = jax.tree.leaves(re)
            assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))
            report["checks"]["npz_roundtrip"] = "ok"
        except Exception as e:  # noqa: BLE001
            report["checks"]["npz_roundtrip"] = f"FAIL: {e}"
            return report

    # 3. pipeline forward on real or synthetic frames
    if video is not None:
        from video_depth_anything_tpu.utils.video_io import read_video_frames
        frames, _ = read_video_frames(video, process_length=64,
                                      target_fps=-1, max_res=640)
        size = input_size or 518
    else:
        frames = synthetic_video()
        size = input_size or 140  # small but real multi-window geometry
    pipe = VideoDepthPipeline(cfg, params)
    d32, _ = pipe.infer_video_depth(frames, input_size=size, fp32=True)
    d16, _ = pipe.infer_video_depth(frames, input_size=size, fp32=False)
    finite = bool(np.isfinite(d32).all() and np.isfinite(d16).all())
    nonneg = bool((d32 >= 0).all())
    report["checks"]["finite"] = "ok" if finite else "FAIL: non-finite depths"
    report["checks"]["nonnegative"] = "ok" if nonneg else "FAIL: negative depths"

    # 4. bf16 budget (same check tests/test_precision_budget.py pins on
    #    random weights, now on the real ones)
    drift = precision_drift_report(d16, d32)
    report["bf16_drift"] = drift
    within = (drift["max_err_frac"] < MAX_ERR_FRAC
              and drift["mean_err_frac"] < MEAN_ERR_FRAC)
    report["checks"]["bf16_budget"] = "ok" if within else (
        f"FAIL: {drift} exceeds max {MAX_ERR_FRAC}/mean {MEAN_ERR_FRAC}")

    # 5. optional real benchmark eval (AbsRel/delta1 vs the reference
    #    protocol) when a benchmark root + predictions dir are supplied
    if benchmark_json:
        from video_depth_anything_tpu.benchmark import evaluate as bev
        report["benchmark"] = {}
        for ds in ("sintel", "scannet", "kitti", "bonn"):
            try:
                dcfg = bev.dataset_eval_config(ds, benchmark_json)
                report["benchmark"][ds] = bev.eval_dataset(infer_path, dcfg)
            except (FileNotFoundError, ValueError):
                continue

    report["ok"] = all(v == "ok" for v in report["checks"].values())
    return report


def main():
    from video_depth_anything_tpu.utils.platform_env import (
        honor_jax_platforms_env)
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", nargs="?", default=None,
                        help=".pth/.npz; default: scan ./checkpoints/")
    parser.add_argument("--encoder", default=None)
    parser.add_argument("--video", default=None,
                        help="real video to validate on (default: synthetic)")
    parser.add_argument("--input_size", type=int, default=None)
    parser.add_argument("--benchmark_json", default=None,
                        help="benchmark root (manifest dir) for a full eval run")
    parser.add_argument("--infer_path", default=None,
                        help="predictions dir for --benchmark_json")
    args = parser.parse_args()

    if args.checkpoint:
        paths = [args.checkpoint]
    else:
        paths = sorted(glob.glob("checkpoints/*.pth")) or \
            sorted(glob.glob("checkpoints/*.npz"))
        if not paths:
            sys.exit("no checkpoints found under ./checkpoints/ — run "
                     "tools/get_weights.sh on a networked machine and copy "
                     "the .pth files here")

    ok = True
    for p in paths:
        rep = validate_one(p, args.encoder, args.video, args.input_size,
                           args.benchmark_json, args.infer_path)
        print(json.dumps(rep, indent=2))
        ok &= rep["ok"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
