#!/usr/bin/env python3
"""Export the serving window program as an AOT StableHLO artifact.

Produces `<out>` (+ `<out>.json` metadata) via utils/serving_export.py —
the exact program `run.py` compiles per window, frozen for deployment.
Weights travel separately (the artifact takes params as arguments), so one
artifact serves every checkpoint of its encoder.

Examples:
  # Artifact for 1080p serving on TPU, produced anywhere (CPU CI included)
  python tools/export_serving.py --encoder vitl --src_hw 1080 1920 \
      --platforms tpu --output vitl_1080p.vda

  # Verify an artifact against the live pipeline (requires model code)
  python tools/export_serving.py --encoder vits --src_hw 280 280 \
      --output /tmp/a.vda --verify
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--metric", action="store_true")
    ap.add_argument("--src_hw", type=int, nargs=2, required=True,
                    metavar=("H", "W"), help="serving frame resolution "
                    "(after run.py's --max_res clamp, if any)")
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--windows_per_batch", type=int, default=1)
    ap.add_argument("--platforms", type=str, nargs="+", default=None,
                    help="lowering targets, e.g. tpu (default: current "
                    "backend)")
    ap.add_argument("--use_pallas", action="store_true",
                    help="embed the Pallas attention custom call "
                    "(TPU-only artifact)")
    ap.add_argument("--int8", action="store_true",
                    help="export over the int8-quantized param tree "
                    "(serving host quantizes once via calibrate_stats + "
                    "quantize_model, or the persisted .int8calib.npz)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--verify", action="store_true",
                    help="deserialize and compare one random window "
                    "against the live pipeline on this host's backend")
    args = ap.parse_args()

    from video_depth_anything_tpu.utils.platform_env import (
        honor_jax_platforms_env)
    honor_jax_platforms_env()
    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.utils import serving_export

    cfg = get_model_config(args.encoder, metric=args.metric)
    if (args.platforms and "tpu" in args.platforms
            and not args.use_pallas):
        # Round-5 TPU measurement (tools/bench_serving_artifact.py): the
        # XLA-attention artifact serves ~6% slower than the Pallas one.
        print("note: TPU-targeted artifact without --use_pallas will "
              "serve XLA attention (~6% slower than the Pallas kernel "
              "the live pipeline runs); pass --use_pallas for TPU "
              "deployments", file=sys.stderr)
    exp = serving_export.export_window_program(
        cfg, tuple(args.src_hw), input_size=args.input_size, fp32=args.fp32,
        windows_per_batch=args.windows_per_batch, platforms=args.platforms,
        use_pallas=args.use_pallas, quant="int8" if args.int8 else None)
    serving_export.save_exported(exp, args.output, {
        "encoder": args.encoder, "metric": args.metric,
        "src_hw": list(args.src_hw), "input_size": args.input_size,
        "fp32": args.fp32, "windows_per_batch": args.windows_per_batch,
        "use_pallas": args.use_pallas,
        "quant": "int8" if args.int8 else None,
    })
    size = os.path.getsize(args.output)
    print(f"wrote {args.output} ({size / 1e6:.1f} MB, "
          f"platforms={list(exp.platforms)})")

    if args.verify:
        import jax
        import numpy as np

        from video_depth_anything_tpu.models.video_depth import init_params
        from video_depth_anything_tpu.pipeline import preprocess

        params = init_params(0, cfg)
        rng = np.random.default_rng(0)
        win = rng.integers(0, 256, size=(args.windows_per_batch, 32,
                                         *args.src_hw, 3), dtype=np.uint8)
        eff = preprocess.effective_input_size(*args.src_hw, args.input_size)
        net_hw = preprocess.network_input_hw(*args.src_hw, eff)
        if args.int8:
            p = serving_export.quantize_for_serving(
                params, win, cfg, net_hw, fp32=args.fp32,
                use_pallas=args.use_pallas)
        else:
            p = serving_export.cast_params(params, fp32=args.fp32)
        loaded = serving_export.load_exported(args.output)
        got = np.asarray(loaded.call(p, win))
        dt = np.float32 if args.fp32 else "bfloat16"
        oracle = jax.jit(serving_export.build_window_fn(
            cfg, net_hw, tuple(args.src_hw), dt, args.windows_per_batch,
            use_pallas=args.use_pallas))
        want = np.asarray(oracle(p, win))
        np.testing.assert_array_equal(got, want)
        print("verify: artifact output == live program (bit-exact)")


if __name__ == "__main__":
    main()
