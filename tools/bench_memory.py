#!/usr/bin/env python3
"""Compiled-program HBM footprint of the window forward (VRAM parity row).

The reference publishes GPU VRAM for the 1x32x518x518 window inference
(README.md:52-53,59-60: vits 7.3/6.8 GB fp32/fp16, vitl 26.7/23.6 GB
fp32/fp16 on A100). This framework's counterpart is XLA's own memory
analysis of the compiled window program: arguments (weights + frames) +
outputs + peak temporaries. Measured AOT — jit(...).lower(ShapeDtypeStruct)
.compile().memory_analysis() — so no parameters are materialized and no
bytes touch the device; the numbers are the compiler's allocation plan,
i.e. what serving actually reserves per chip.

Usage: python tools/bench_memory.py [--encoders vits vitl] [--size 518]
Prints one JSON line per (encoder, dtype).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference A100 VRAM (GB) at 1x32x518x518: README.md:52-53 (vits fp32/fp16),
# :59-60 (vitl fp32/fp16). bf16 compares against the fp16 row (same width).
REF_VRAM_GB = {("vits", "float32"): 7.3, ("vits", "bfloat16"): 6.8,
               ("vitl", "float32"): 26.7, ("vitl", "bfloat16"): 23.6}


def measure(encoder: str, size: int, fp32: bool):
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.config import INFER_LEN, get_model_config
    from video_depth_anything_tpu.models.video_depth import (forward,
                                                             param_shapes)
    from video_depth_anything_tpu.pipeline import preprocess

    cfg = get_model_config(encoder)
    dtype = jnp.float32 if fp32 else jnp.bfloat16
    net_hw = (size, size)

    # Abstract parameter tree (no trunc-normal init, no device transfer).
    p_shapes = param_shapes(cfg)
    p_shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        p_shapes)
    win = jax.ShapeDtypeStruct((1, INFER_LEN, size, size, 3), jnp.uint8)

    def fn(params, win_u8):
        x = preprocess.preprocess_frames(win_u8, net_hw, dtype=dtype)
        return forward(params, x, cfg)

    compiled = jax.jit(fn).lower(p_shapes, win).compile()
    mem = compiled.memory_analysis()
    gib = 1024.0 ** 3
    arg = mem.argument_size_in_bytes / gib
    out_bytes = mem.output_size_in_bytes
    if out_bytes == 0:  # CPU backend reports 0 — size the abstract outputs
        out_bytes = sum(s.size * s.dtype.itemsize
                        for s in jax.tree.leaves(jax.eval_shape(fn, p_shapes,
                                                                win)))
    out = out_bytes / gib
    tmp = mem.temp_size_in_bytes / gib
    code = mem.generated_code_size_in_bytes / gib
    total = arg + out + tmp + code
    # The published A100 rows are all at 518 px — no ref comparison at
    # other sizes.
    ref = (REF_VRAM_GB.get((encoder, jnp.dtype(dtype).name))
           if size == 518 else None)
    return {"metric": f"{encoder}_hbm_gib_{size}",
            "dtype": jnp.dtype(dtype).name,
            "value": round(total, 3), "unit": "GiB",
            "weights_plus_frames_gib": round(arg, 3),
            "temps_gib": round(tmp, 3), "output_gib": round(out, 6),
            "code_gib": round(code, 4),
            "ref_a100_vram_gb": ref,
            "vs_ref": round(ref / total, 2) if ref else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="+", default=["vits", "vitl"])
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--fp32_only", action="store_true")
    ap.add_argument("--bf16_only", action="store_true")
    args = ap.parse_args()
    for enc in args.encoders:
        for fp32 in ((True,) if args.fp32_only else
                     (False,) if args.bf16_only else (False, True)):
            print(json.dumps(measure(enc, args.size, fp32)), flush=True)


if __name__ == "__main__":
    main()
