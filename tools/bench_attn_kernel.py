"""A/B microbench of the packed flash-attention kernel variants on TPU.

Times flash_attention_qkv_fused at the vitl 518px shape (b=32 frames,
S=1370, 16 heads, C=1024) with an in-graph chain amortizing the tunnel
dispatch latency, comparing kernel variants within ONE process (cross-
process absolute numbers vary +-30% on this box). Also cross-checks the
variants' numerics on device.

Run: python tools/bench_attn_kernel.py [b] [s] [heads] [dh]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.ops.pallas_attention import (
    flash_attention_packed,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1370
H = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DH = int(sys.argv[4]) if len(sys.argv) > 4 else 64
CHAIN = 8
ITERS = 8


def bench(variant_kwargs, label):
    c = H * DH

    @jax.jit
    def fn(q, k, v):
        def body(i, acc):
            out = flash_attention_packed(
                q + (acc * 1e-12).astype(q.dtype), k, v, num_heads=H,
                scale=DH ** -0.5, **variant_kwargs)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, c)), jnp.bfloat16)
               for _ in range(3))
    float(fn(q, k, v))  # compile
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(q, k, v))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    flops = 4 * B * H * S * S * DH
    print(f"  {label:24s} {best*1e3:8.3f} ms/call  "
          f"{flops/best/1e12:7.2f} TF/s", flush=True)
    return best


def main():
    print(f"packed attention, b={B} s={S} h={H} dh={DH}, "
          f"chain={CHAIN} ({jax.default_backend()})", flush=True)
    # numerics cross-check first (one small dispatch)
    rng = np.random.default_rng(1)
    qq, kk, vv = (jnp.asarray(rng.standard_normal((2, S, H * DH)), jnp.bfloat16)
                  for _ in range(3))
    a = np.asarray(flash_attention_packed(qq, kk, vv, num_heads=H,
                                          scale=DH ** -0.5,
                                          mxu_denom=False), np.float32)
    b = np.asarray(flash_attention_packed(qq, kk, vv, num_heads=H,
                                          scale=DH ** -0.5,
                                          mxu_denom=True), np.float32)
    print(f"  variant agreement: max|diff| = {np.abs(a - b).max():.2e}",
          flush=True)
    t_old = bench(dict(mxu_denom=False), "vpu denom (old)")
    t_new = bench(dict(mxu_denom=True), "mxu denom")
    t_old2 = bench(dict(mxu_denom=False), "vpu denom (re-run)")
    print(f"  mxu-denom speedup: {min(t_old, t_old2) / t_new:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
