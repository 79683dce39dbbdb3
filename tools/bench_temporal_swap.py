"""In-model A/B: grouped dh=32 temporal attention as XLA einsum vs the
Pallas kernel (ops/pallas_temporal_attention.py).

Isolated A/B (tools/bench_temporal_kernel.py) shows the kernel beating the
einsum path at the grouped m2/m3 shapes (74^2: 3.69 vs 4.90 ms/call) while
losing at dh>=64 — but in-model custom-call fusion barriers have eaten
isolated wins before (DESIGN.md), so this times the FULL vitl window
forward with the grouped branch routed either way, in ONE process (box
speed varies between sessions; only same-process A/B is valid).

Run: python tools/bench_temporal_swap.py [vits|vitl]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu import config as vcfg
from video_depth_anything_tpu.models import video_depth
from video_depth_anything_tpu.ops import attention as attn_ops
from video_depth_anything_tpu.ops import pallas_temporal_attention as pta

ENC = sys.argv[1] if len(sys.argv) > 1 else "vitl"
T = 32
SIZE = 518
CHAIN = 3
ITERS = 5


def timed_full(params, x, cfg):
    @jax.jit
    def fn(p, x):
        def body(i, acc):
            out = video_depth.forward(p, x + (acc * 1e-12).astype(x.dtype),
                                      cfg, use_pallas=True)
            return jnp.sum(out)
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    float(fn(params, x))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(params, x))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3


def main():
    cfg = vcfg.MODEL_CONFIGS[ENC]
    params = video_depth.init_params(0, cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, T, SIZE, SIZE, 3)), jnp.bfloat16)

    real_flat = attn_ops.temporal_flat_attention

    def routed(q, k, v, *, num_heads, scale):
        # grouped dh=32 shape: C = 128 after head grouping, 4 heads
        if q.shape[-1] == 128 and num_heads == 4:
            return pta.temporal_flash_attention(q, k, v, num_heads=num_heads,
                                                scale=scale)
        return real_flat(q, k, v, num_heads=num_heads, scale=scale)

    t_base = timed_full(params, x, cfg)
    print(f"{ENC} einsum grouped (base) : {t_base:8.2f} ms/window "
          f"({t_base / T:.3f} ms/frame)", flush=True)

    attn_ops.temporal_flat_attention = routed
    try:
        t_kernel = timed_full(params, x, cfg)
    finally:
        attn_ops.temporal_flat_attention = real_flat
    print(f"{ENC} kernel grouped        : {t_kernel:8.2f} ms/window "
          f"({t_kernel / T:.3f} ms/frame)", flush=True)
    print(f"delta: {t_base - t_kernel:+.2f} ms/window", flush=True)


if __name__ == "__main__":
    main()
