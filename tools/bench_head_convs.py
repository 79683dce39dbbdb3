"""Map XLA time of the DPT head's conv stages at vitl-518^2 window shapes.

Times each stage as its own jitted chain (dispatch-amortized) to find
which stages are far from the bf16 matmul plateau (~150 TF/s) and thus
worth a Pallas kernel. Run on the TPU: python tools/bench_head_convs.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.ops import nn as vnn
from video_depth_anything_tpu.ops.resize import resize_bilinear_align_corners

N = 32
CHAIN = 6
_DISPATCH = [0.0]  # measured per-call tunnel round-trip, subtracted out


def measure_dispatch():
    g = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0.0)
    g(s).block_until_ready()
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        g(s).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    _DISPATCH[0] = best
    print(f"dispatch round-trip: {best*1e3:.2f} ms", flush=True)


def timed(fn, x, iters=4):
    def chained(x):
        y = fn(x)
        for _ in range(CHAIN - 1):
            y = fn(x + y[..., :1, :1, :1] * 0)  # feed dependence
        return y
    g = jax.jit(chained)
    g(x).block_until_ready()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        g(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0 - _DISPATCH[0]) / CHAIN)
    return best


def conv_p(rng, kh, kw, ci, co):
    return {"w": jnp.asarray(rng.normal(0, 0.04, (kh, kw, ci, co)),
                             jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)}


def main():
    measure_dispatch()
    rng = np.random.default_rng(0)
    stages = []

    # output_conv1: 3x3 256->128 @ 296^2 (dpt.py output head)
    p1 = conv_p(rng, 3, 3, 256, 128)
    stages.append(("output_conv1 3x3 256->128 @296^2",
                   (N, 296, 296, 256),
                   lambda x: vnn.conv2d(p1, x, 1, 1),
                   2 * N * 296 * 296 * 9 * 256 * 128))

    # output tail: conv3x3 128->32 + relu + 1x1 32->1 + relu @ 518^2
    p2 = conv_p(rng, 3, 3, 128, 32)
    p3 = conv_p(rng, 1, 1, 32, 1)

    def tail(x):
        y = vnn.conv2d(p2, x, 1, 1)
        y = jnp.maximum(y, 0)
        y = vnn.conv2d(p3, y, 1, 0)
        return jnp.maximum(y, 0)
    stages.append(("output tail 3x3 128->32 + 1x1 32->1 @518^2",
                   (N, 518, 518, 128), tail,
                   2 * N * 518 * 518 * (9 * 128 * 32 + 32)))

    # layer1_rn: 3x3 256->256 @148^2 (scratch harmonization)
    p4 = conv_p(rng, 3, 3, 256, 256)
    stages.append(("layer1_rn 3x3 256->256 @148^2",
                   (N, 148, 148, 256),
                   lambda x: vnn.conv2d(p4, x, 1, 1),
                   2 * N * 148 * 148 * 9 * 256 * 256))

    # upsample 296->518 on 128ch (the resize between tail convs)
    stages.append(("bilinear 296->518 @128ch",
                   (N, 296, 296, 128),
                   lambda x: resize_bilinear_align_corners(x, (518, 518)),
                   0))

    for name, shape, fn, fl in stages:
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)
        t = timed(fn, x)
        tf = fl / t / 1e12 if fl else 0.0
        print(f"{name}: {t*1e3:8.3f} ms  ({tf:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
