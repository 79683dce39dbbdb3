"""A/B bench of the temporal-attention kernel at the real module shapes.

The in-model ablation (bench_ablate --temporal) showed the temporal
attention kernel costing ~26 ms/window on vitl — ~4 TF/s — so this tool
times isolated variants at the four motion-module shapes (same process,
chain-amortized dispatch):

  kernel[B]   Pallas temporal_flash_attention with _VMEM_BUDGET = B MB
  xla-flat    the same (frame*head)-flattened masked softmax as plain XLA
              batched matmuls (scores materialize in HBM)
  xla-head    per-head batched [T,dh] attention (ops/attention.temporal_mha)

Run: python tools/bench_temporal_kernel.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.ops import pallas_temporal_attention as pta
from video_depth_anything_tpu.ops.attention import temporal_mha

T = 32
HEADS = 8
CHAIN = 64
ITERS = 3

# (label, pixels P, channels C) — vitl 518^2 x32 window, x2 attention calls
# per module. m2/m3 (dh=32) reach the kernel via to_groups: P*2 pixels of
# 4 heads x 128 lanes.
SHAPES = [
    ("m0 37^2 c1024", 1369, 1024, 8),
    ("m1 19^2 c1024", 361, 1024, 8),
    ("m2 37^2 c256(grouped)", 2738, 128, 4),
    ("m3 74^2 c256(grouped)", 10952, 128, 4),
]


def timed(fn, *args):
    @jax.jit
    def g(*a):
        out = a[0]
        for _ in range(CHAIN):
            out = fn(out, *a[1:])
        return jnp.sum(out.astype(jnp.float32))

    float(g(*args))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3


def xla_flat(q, k, v, num_heads, scale):
    # The real in-model path — no local copy, so numerics fixes (e.g. the
    # masked stabilizer max) are always the production ones.
    from video_depth_anything_tpu.ops.attention import temporal_flat_attention
    return temporal_flat_attention(q, k, v, num_heads=num_heads, scale=scale)


def xla_head(q, k, v, num_heads, scale):
    p, t, c = q.shape
    dh = c // num_heads
    qh = (q * scale).reshape(p, t, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(p, t, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(p, t, num_heads, dh).transpose(0, 2, 1, 3)
    o = temporal_mha(qh, kh, vh)
    return o.transpose(0, 2, 1, 3).reshape(p, t, c)


def main():
    rng = np.random.default_rng(0)
    scale = 1.0
    for label, p, c, nh in SHAPES:
        q, k, v = (jnp.asarray(rng.standard_normal((p, T, c)), jnp.bfloat16)
                   for _ in range(3))
        print(f"{label}: P={p} C={c} H={nh}", flush=True)
        for budget in (4, 8, 12):
            pta._VMEM_BUDGET = budget * 1024 * 1024
            ms = timed(lambda x, kk, vv: pta.temporal_flash_attention(
                x, kk, vv, num_heads=nh, scale=scale), q, k, v)
            print(f"  kernel[{budget:2d}MB] : {ms:7.3f} ms", flush=True)
        ms = timed(lambda x, kk, vv: xla_flat(x, kk, vv, nh, scale), q, k, v)
        print(f"  xla-flat    : {ms:7.3f} ms", flush=True)
        ms = timed(lambda x, kk, vv: xla_head(x, kk, vv, nh, scale), q, k, v)
        print(f"  xla-head    : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
