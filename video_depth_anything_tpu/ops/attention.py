"""Attention for the two regimes in Video Depth Anything.

1. Spatial ViT attention (reference dinov2_layers/attention.py:29-81):
   seq ~1370 tokens, batch = windows*frames. The hot path (~70% of model
   FLOPs). On TPU this dispatches to a Pallas flash-attention kernel
   (ops/pallas_attention.py); on CPU/testing it falls back to a fused XLA
   einsum with fp32 softmax.

2. Temporal attention (reference motion_module/attention.py:182-293):
   seq = T (<=32) frames, batch = B*H*W spatial positions. Tiny-seq /
   huge-batch: the 32x32 score matrix is cheap, so flash tiling buys
   nothing — a plain batched einsum lets XLA fuse it with the surrounding
   projections. The xformers 65535 batch-splitting of the reference is
   unnecessary (grid handles any batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_mha(q, k, v, scale):
    """q,k,v: [B, S, H, D] -> [B, S, H, D] with fp32 softmax accumulation."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=q.dtype)
    return out


def mha(q, k, v, scale: float | None = None, use_pallas: bool | None = None):
    """Multi-head attention on [B, S, H, D] tensors.

    scale defaults to D**-0.5 (reference attention.py:41).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and q.shape[1] >= 256
    if use_pallas:
        from .pallas_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _xla_mha(q, k, v, scale)


def temporal_mha(q, k, v, scale: float | None = None):
    """Temporal attention on [B, T, H, D] with tiny T. Always XLA-fused."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _xla_mha(q, k, v, scale)
