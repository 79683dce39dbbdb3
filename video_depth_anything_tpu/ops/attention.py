"""Attention for the two regimes in Video Depth Anything.

Convention: q, k, v are [B, H, S, D] (head-major). Producers emit this
layout directly via per-head projection einsums ('nsd,dhk->nhsk'), letting
XLA fuse the head split into the projection matmul instead of paying a
separate transpose — and it is the layout Mosaic requires for the Pallas
kernel's block shapes (last two dims = [S-block, D]).

1. Spatial ViT attention (reference dinov2_layers/attention.py:29-81):
   seq ~1370, batch = windows*frames — the hot path, dispatched to the
   Pallas kernel on TPU (ops/pallas_attention.py), fused XLA einsum with
   fp32 softmax elsewhere.

2. Temporal attention (reference motion_module/attention.py:182-293):
   seq = T (<=32), batch = B*H*W pixels. Tiny-seq/huge-batch: a 32x32
   score matrix is cheap; plain einsums fuse best (the reference's
   xformers 65535 batch-splitting is unnecessary).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_mha(q, k, v, scale):
    """q,k,v: [B, H, S, D] -> [B, H, S, D] with fp32 softmax."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=q.dtype)


def mha(q, k, v, scale: float | None = None, use_pallas: bool | None = None):
    """Multi-head attention on [B, H, S, D] tensors.

    scale defaults to D**-0.5 (reference attention.py:41).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and q.shape[2] >= 256
    if use_pallas:
        from .pallas_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _xla_mha(q, k, v, scale)


def temporal_mha(q, k, v, scale: float | None = None):
    """Temporal attention on [B, H, T, D] with tiny T. Always XLA-fused."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _xla_mha(q, k, v, scale)


def temporal_flat_attention(q, k, v, *, num_heads: int, scale: float):
    """(frame*head)-flattened temporal attention on [P, T, C] — TPU path.

    Per-pixel [T, T]-per-head matmuls are hopeless on a 128x128 MXU, so
    frames and heads flatten into one axis of T*H (256 for T=32, dh=128)
    and a single [T*H, T*H] masked score matrix per pixel runs as one
    full-width batched matmul; cross-head pairs are masked out of the
    softmax, so the PV contraction eliminates them exactly (same trick as
    ops/pallas_temporal_attention.py, whose kernel form measured SLOWER
    in-model: the pallas custom call is a fusion barrier and XLA brackets
    it with layout copies, ~1.5 ms per call at vitl shapes, while this
    einsum form fuses into the surrounding projections; tools/
    bench_ablate.py --temporal measured the swap at -10.7 ms/window).
    Cross-head pairs are masked to -inf BEFORE the stabilizer max (the
    diagonal is same-head, so the row max stays finite): an unmasked
    cross-head logit ~88 above the same-head max would underflow every
    real probability to fp32 zero. Masking s costs the same single
    `where` sweep as masking e would. Normalization happens on the
    [*, dh] PV output (epilogue-denominator form), not the [*, T*H]
    probability tile.
    """
    p, t, c = q.shape
    dh = c // num_heads
    th = t * num_heads
    qf = (q * jnp.asarray(scale, q.dtype)).reshape(p, th, dh)
    kf = k.reshape(p, th, dh)
    vf = v.reshape(p, th, dh)
    s = jnp.einsum("pid,pjd->pij", qf, kf,
                   preferred_element_type=jnp.float32)
    # Flat index = t*num_heads + h (the C axis is [head-major | dh], so the
    # reshape enumerates heads fastest): head id = idx % num_heads.
    ids = jax.lax.broadcasted_iota(jnp.int32, (th, th), 0) % num_heads
    jds = jax.lax.broadcasted_iota(jnp.int32, (th, th), 1) % num_heads
    s = jnp.where((ids == jds)[None], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    inv = 1.0 / jnp.maximum(jnp.sum(e, -1, keepdims=True), 1e-30)
    o = jnp.einsum("pij,pjd->pid", e.astype(v.dtype), vf,
                   preferred_element_type=jnp.float32)
    return (o * inv).astype(q.dtype).reshape(p, t, c)
