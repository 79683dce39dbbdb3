#!/usr/bin/env python3
"""bf16/int8 vs fp32 end-to-end drift at the SERVING shape (VERDICT r4 #6).

The committed precision budgets (tests/test_precision_budget.py,
tests/test_quant.py) are measured at toy resolution (56-70 px); int8
calibration stats are resolution-dependent (the pipeline guards
calibration geometry, pipeline/infer.py::_load_calib), so this tool
measures the same affine-aligned drift report at input_size=518 — the
reference CLI's default serving shape (run.py:40-43) — and prints one
JSON line for PARITY.md.

  python tools/bench_drift_518.py --encoder vitl --frames 50

Runs three pipelines (fp32 oracle, bf16, int8) over the shared synthetic
structured video at 518^2 network resolution and reports max/mean error
as fractions of the fp32 oracle's depth range after scale/shift alignment
(utils/precision.py — relative depth is affine-invariant).
"""
import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--src_hw", type=int, nargs=2, default=(644, 644),
                    metavar=("H", "W"))
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    from video_depth_anything_tpu.utils.platform_env import (
        honor_jax_platforms_env)
    honor_jax_platforms_env()

    import jax

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.utils.precision import (
        precision_drift_report, synthetic_video)

    cfg = get_model_config(args.encoder)
    params = init_params(jax.random.PRNGKey(0), cfg)
    frames = synthetic_video(args.frames, tuple(args.src_hw), args.seed)
    use_pallas = jax.default_backend() != "cpu"
    kw = dict(input_size=args.input_size)

    p32 = VideoDepthPipeline(cfg, params, use_pallas=use_pallas)
    d32, _ = p32.infer_video_depth(frames, fp32=True, **kw)
    del p32

    pb = VideoDepthPipeline(cfg, params, use_pallas=use_pallas)
    dbf, _ = pb.infer_video_depth(frames, **kw)
    del pb
    rep_bf16 = precision_drift_report(dbf, d32)

    p8 = VideoDepthPipeline(cfg, params, use_pallas=use_pallas, quant="int8")
    d8, _ = p8.infer_video_depth(frames, **kw)
    del p8
    rep_int8 = precision_drift_report(d8, d32)

    print(json.dumps({
        "metric": f"{args.encoder}_drift_{args.input_size}",
        "frames": args.frames, "src_hw": list(args.src_hw),
        "backend": jax.default_backend(),
        "bf16_max_err_frac": round(rep_bf16["max_err_frac"], 5),
        "bf16_mean_err_frac": round(rep_bf16["mean_err_frac"], 6),
        "int8_max_err_frac": round(rep_int8["max_err_frac"], 5),
        "int8_mean_err_frac": round(rep_int8["mean_err_frac"], 6),
    }))


if __name__ == "__main__":
    main()
