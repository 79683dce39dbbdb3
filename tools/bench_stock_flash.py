"""A/B: our packed flash kernel vs the stock JAX TPU flash-attention op.

The in-model regime is spatial ViT attention at 518px: b=32 frames,
S=1370 tokens, 16 heads x dh 64 (vitl). Our kernel works on the model's
native packed [B, S, H*dh] layout; the stock kernel
(jax.experimental.pallas.ops.tpu.flash_attention) wants [B, H, S, dh]
and sequence lengths that tile its blocks, so the honest comparison
includes the pad-to-1536 (512-multiple blocks) + head split/merge transposes the model would
have to pay to call it.

Run: python tools/bench_stock_flash.py [b] [s] [heads] [dh]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.ops.pallas_attention import flash_attention_packed

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1370
H = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DH = int(sys.argv[4]) if len(sys.argv) > 4 else 64
CHAIN = 8
ITERS = 8
FLOPS = 4 * B * H * S * S * DH


def timed(fn, *args):
    float(fn(*args))  # compile
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def report(label, t):
    print(f"  {label:28s} {t*1e3:8.3f} ms/call  {FLOPS/t/1e12:7.2f} TF/s",
          flush=True)


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    print(f"spatial attention A/B, b={B} s={S} h={H} dh={DH}, chain={CHAIN} "
          f"({jax.default_backend()})", flush=True)
    c = H * DH
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, c)), jnp.bfloat16)
               for _ in range(3))
    scale = DH ** -0.5

    @jax.jit
    def ours(q, k, v):
        def body(i, acc):
            out = flash_attention_packed(
                q + (acc * 1e-12).astype(q.dtype), k, v, num_heads=H,
                scale=scale, mxu_denom=True)
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    # Stock kernel: pad S to a 128 multiple, mask padding via segment ids
    # (pad keys get segment 1, real tokens 0 -> scores masked to -inf).
    s_pad = -(-S // 512) * 512  # stock blocks want 512-multiples
    seg = jnp.zeros((B, s_pad), jnp.int32).at[:, S:].set(1)
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds
    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1)

    @jax.jit
    def stock(q, k, v):
        def body(i, acc):
            qi = q + (acc * 1e-12).astype(q.dtype)
            # model-side cost: pad + split heads + transpose to [B,H,S,dh]
            def to4(x):
                x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))
                return x.reshape(B, s_pad, H, DH).transpose(0, 2, 1, 3)
            o = flash_attention(to4(qi), to4(k), to4(v),
                                segment_ids=SegmentIds(q=seg, kv=seg),
                                sm_scale=scale, block_sizes=bs)
            o = o.transpose(0, 2, 1, 3).reshape(B, s_pad, c)[:, :S]
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    # numerics cross-check on a small dispatch
    a = np.asarray(flash_attention_packed(q[:2], k[:2], v[:2], num_heads=H,
                                          scale=scale, mxu_denom=True),
                   np.float32)

    def stock_once(q, k, v, b):
        sg = seg[:b]
        def to4(x):
            x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))
            return x.reshape(b, s_pad, H, DH).transpose(0, 2, 1, 3)
        o = flash_attention(to4(q), to4(k), to4(v),
                            segment_ids=SegmentIds(q=sg, kv=sg),
                            sm_scale=scale, block_sizes=bs)
        return o.transpose(0, 2, 1, 3).reshape(b, s_pad, c)[:, :S]

    bref = np.asarray(jax.jit(stock_once, static_argnums=3)(
        q[:2], k[:2], v[:2], 2), np.float32)
    print(f"  agreement ours vs stock: max|diff| = {np.abs(a - bref).max():.2e}",
          flush=True)

    t_ours = timed(ours, q, k, v)
    report("ours (packed bf16)", t_ours)
    t_stock = timed(stock, q, k, v)
    report("stock flash (+layout)", t_stock)
    t_ours2 = timed(ours, q, k, v)
    report("ours (re-run)", t_ours2)
    print(f"  stock/ours: {t_stock / min(t_ours, t_ours2):.3f}x", flush=True)


if __name__ == "__main__":
    main()
