#!/usr/bin/env python3
"""Real-scale training-step benchmark (VERDICT r1 item 6).

Runs the reference's actual training configuration — encoder vits,
clip_len 20, 518x518, batch 1, frozen encoder (reference
configs/config.yaml:1-11 + train.py:218-219) — for a few optimizer steps
on the local accelerator and prints ONE JSON line with step latency and
device memory. This is the regime the toy-shape training tests
(tests/test_training.py, 64-dim at 28^2) cannot see.

Usage: python tools/bench_train_step.py [--encoder vits] [--clip_len 20]
       [--size 518] [--batch 1] [--iters 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"])
    ap.add_argument("--clip_len", type=int, default=20)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--fp32", action="store_true",
                    help="compute in fp32 (default bf16 with fp32 master)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.training.train_state import (
        TrainConfig, create_train_state, train_step)

    cfg = get_model_config(args.encoder, num_frames=args.clip_len)
    tc = TrainConfig(
        compute_dtype="float32" if args.fp32 else "bfloat16",
        clip_len=args.clip_len)
    params = init_params(0, cfg)
    state = create_train_state(params, tc)

    rng = np.random.default_rng(0)
    hw = (args.size, args.size)
    batch = {
        "video": jnp.asarray(rng.standard_normal(
            (args.batch, args.clip_len, *hw, 3)), jnp.float32),
        "gt": jnp.asarray(rng.random(
            (args.batch, args.clip_len, *hw)), jnp.float32),
        "mask": jnp.ones((args.batch, args.clip_len, *hw), jnp.float32),
    }

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, cfg, tc)
    float(metrics["loss"])  # scalar readout forces completion
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, cfg, tc)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k + "_gb"] = round(stats[k] / 2**30, 2)
    except Exception:
        pass

    print(json.dumps({
        "metric": f"{args.encoder}_train_step_{args.size}_clip{args.clip_len}",
        "value": round(p50 * 1000.0, 1),
        "unit": "ms/step",
        "clips_per_sec": round(args.batch / p50, 3),
        "frames_per_sec": round(args.batch * args.clip_len / p50, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        **mem,
    }))


if __name__ == "__main__":
    main()
