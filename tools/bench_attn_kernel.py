"""A/B microbench of the packed flash-attention kernel variants on TPU.

Times flash_attention_qkv_fused at the vitl 518px shape (b=32 frames,
S=1370, 16 heads, C=1024) with an in-graph chain amortizing the tunnel
dispatch latency, comparing kernel variants within ONE process (cross-
process absolute numbers vary +-30% on this box). Also cross-checks the
variants' numerics on device.

Run: python tools/bench_attn_kernel.py [b] [s] [heads] [dh]
     python tools/bench_attn_kernel.py --int8 [b] [s] [heads] [dh]
       (A/B the int8-QK kernel against the bf16 one at the same shape)
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
    flash_attention_packed_qk8,
)

INT8 = "--int8" in sys.argv
argv = [a for a in sys.argv if a != "--int8"]
B = int(argv[1]) if len(argv) > 1 else 32
S = int(argv[2]) if len(argv) > 2 else 1370
H = int(argv[3]) if len(argv) > 3 else 16
DH = int(argv[4]) if len(argv) > 4 else 64
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


def bench_qk8(label):
    """Time the int8-QK kernel at the same shape/chain as bench()."""
    c = H * DH
    scales = jnp.asarray([0.02 * DH ** -0.5, 0.02], jnp.float32)

    @jax.jit
    def fn(q8, k8, v):
        def body(i, acc):
            out = flash_attention_packed_qk8(
                q8, k8, v + (acc * 1e-12).astype(v.dtype), scales,
                num_heads=H)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    q8 = jnp.asarray(rng.integers(-127, 128, (B, S, c)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, S, c)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((B, S, c)), jnp.bfloat16)
    float(fn(q8, k8, v))  # compile
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(q8, k8, v))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    flops = 4 * B * H * S * S * DH
    print(f"  {label:24s} {best*1e3:8.3f} ms/call  "
          f"{flops/best/1e12:7.2f} TF/s", flush=True)
    return best


def main():
    print(f"packed attention, b={B} s={S} h={H} dh={DH}, "
          f"chain={CHAIN} ({jax.default_backend()})", flush=True)
    if INT8:
        t_bf16 = bench(dict(mxu_denom=True), "bf16 QK (mxu denom)")
        t_i8 = bench_qk8("int8 QK")
        t_bf16b = bench(dict(mxu_denom=True), "bf16 QK (re-run)")
        print(f"  int8-QK speedup: {min(t_bf16, t_bf16b) / t_i8:.3f}x",
              flush=True)
        return
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
    c = np.asarray(flash_attention_packed(qq, kk, vv, num_heads=H,
                                          scale=DH ** -0.5,
                                          mxu_denom=True, exp2=True),
                   np.float32)
    print(f"  exp2 agreement: max|diff| = {np.abs(b - c).max():.2e}",
          flush=True)
    t_old = bench(dict(mxu_denom=False), "vpu denom (old)")
    t_new = bench(dict(mxu_denom=True), "mxu denom")
    t_exp2 = bench(dict(mxu_denom=True, exp2=True), "mxu denom + exp2")
    t_old2 = bench(dict(mxu_denom=False), "vpu denom (re-run)")
    t_new2 = bench(dict(mxu_denom=True), "mxu denom (re-run)")
    print(f"  mxu-denom speedup: {min(t_old, t_old2) / min(t_new, t_new2):.3f}x",
          flush=True)
    print(f"  exp2 speedup: {min(t_new, t_new2) / t_exp2:.3f}x", flush=True)


if __name__ == "__main__":
    main()
