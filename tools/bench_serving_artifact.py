#!/usr/bin/env python3
"""Deserialize-and-run an AOT serving artifact ON the accelerator backend
and compare output + latency against the live pipeline program
(VERDICT r4 #5a / weak #4).

Until round 5, artifact round-trips were verified only on CPU toy configs,
and `use_pallas` artifacts had never executed anywhere — so a TPU-targeted
deployment could silently serve XLA attention while the live pipeline runs
the measured-faster Pallas kernel. This tool proves the full story on the
real backend:

  1. export the window program twice (use_pallas on/off) for the current
     backend, serialize + deserialize both;
  2. run both artifacts and the live jitted program on one random window —
     outputs must be bit-exact artifact-vs-live for the matching kernel
     flag;
  3. time all three (same dispatch regime, p50 of --iters calls) so the
     artifact demonstrably keeps the kernel it was exported with.

  python tools/bench_serving_artifact.py --encoder vitl --src_hw 518 518

Prints one JSON line with latencies (ms/frame) and equality results.
"""
import argparse
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl",
                    choices=["vits", "vitb", "vitl", "vitg"])
    ap.add_argument("--src_hw", type=int, nargs=2, default=(518, 518),
                    metavar=("H", "W"))
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no_pallas_b", action="store_true",
                    help="skip the use_pallas=False comparison artifact")
    args = ap.parse_args()

    from video_depth_anything_tpu.utils.platform_env import (
        honor_jax_platforms_env)
    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_depth_anything_tpu.config import INFER_LEN, get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.pipeline import preprocess
    from video_depth_anything_tpu.utils import serving_export

    backend = jax.default_backend()
    use_pallas = backend != "cpu"
    cfg = get_model_config(args.encoder)
    params = serving_export.cast_params(init_params(jax.random.PRNGKey(0),
                                                    cfg))
    rng = np.random.default_rng(0)
    win = rng.integers(0, 256, size=(1, INFER_LEN, *args.src_hw, 3),
                       dtype=np.uint8)
    eff = preprocess.effective_input_size(*args.src_hw, args.input_size)
    net_hw = preprocess.network_input_hw(*args.src_hw, eff)

    def timed(fn, label):
        out = np.asarray(fn())  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        p50 = sorted(ts)[len(ts) // 2]
        print(f"[{label}] p50 {p50 * 1e3:.1f} ms "
              f"({p50 * 1e3 / INFER_LEN:.2f} ms/frame)",
              file=sys.stderr, flush=True)
        return out, p50 * 1e3 / INFER_LEN

    record = {"metric": f"{args.encoder}_serving_artifact_{args.input_size}",
              "backend": backend, "platforms": [backend],
              "use_pallas": use_pallas}

    # Live program (what run.py serves today).
    live_fn = jax.jit(serving_export.build_window_fn(
        cfg, net_hw, tuple(args.src_hw), jnp.bfloat16, 1,
        use_pallas=use_pallas))
    win_dev = jax.device_put(win)
    params_dev = jax.device_put(params)
    live_out, live_ms = timed(lambda: live_fn(params_dev, win_dev), "live")
    record["live_ms_per_frame"] = round(live_ms, 3)

    with tempfile.TemporaryDirectory() as td:
        # Artifact with the live kernel choice (pallas on TPU).
        exp = serving_export.export_window_program(
            cfg, tuple(args.src_hw), input_size=args.input_size,
            platforms=[backend], use_pallas=use_pallas)
        path = os.path.join(td, "artifact.vda")
        serving_export.save_exported(exp, path)
        record["artifact_mb"] = round(os.path.getsize(path) / 1e6, 2)
        loaded = serving_export.load_exported(path)
        art_fn = jax.jit(lambda p, w: loaded.call(p, w))
        art_out, art_ms = timed(lambda: art_fn(params_dev, win_dev),
                                "artifact")
        record["artifact_ms_per_frame"] = round(art_ms, 3)
        record["artifact_bit_exact_vs_live"] = bool(
            np.array_equal(art_out, live_out))

        if use_pallas and not args.no_pallas_b:
            # The portability-default artifact (XLA attention): execution
            # must still be correct, and its latency quantifies what a
            # deployment silently loses by NOT exporting the kernel.
            exp0 = serving_export.export_window_program(
                cfg, tuple(args.src_hw), input_size=args.input_size,
                platforms=[backend], use_pallas=False)
            path0 = os.path.join(td, "artifact_xla.vda")
            serving_export.save_exported(exp0, path0)
            loaded0 = serving_export.load_exported(path0)
            art0_fn = jax.jit(lambda p, w: loaded0.call(p, w))
            art0_out, art0_ms = timed(
                lambda: art0_fn(params_dev, win_dev), "artifact-xla")
            record["artifact_xla_ms_per_frame"] = round(art0_ms, 3)
            scale = max(float(np.abs(live_out).max()), 1e-6)
            record["artifact_xla_max_rel_err"] = round(
                float(np.abs(art0_out - live_out).max()) / scale, 6)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
