"""Pallas TPU kernel for the temporal-attention regime.

Regime (reference motion_module/attention.py:182-293 replaced): per-pixel
attention over T (<=32) frames, batch = B*H*W pixels (1369..5476+ per
window), heads H=8, head_dim 32/128. A batched [T x T] matmul per (pixel,
head) is hopeless on a 128x128 systolic array (~1 TF/s measured via XLA),
and materializing fp32 logits for millions of pixels is HBM-bound.

Trick: flatten (frame, head) into one axis of size T*H (256 for T=32) and
compute a single [T*H x T*H] score matrix per pixel, masking cross-head
pairs with -inf before the softmax. The mask zeroes cross-head
probabilities, so the [T*H x dh] PV matmul contracts them away exactly —
per-head attention emerges from full-size MXU matmuls. 8x more FLOPs, ~25x
better MXU utilization, and scores never leave VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic allocates stack for the softmax chain's vector temporaries
# (several score-tile-sized buffers) on top of the scratch and the
# double-buffered IO blocks, so the budget stays well under the 16MB
# scoped-vmem limit.
_VMEM_BUDGET = 4 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, scores, probs, *, num_heads: int,
            block_p: int):
    """Three phases so the MXU never stalls on interleaved VPU softmaxes:
    (1) unrolled per-pixel QK^T matmuls into a scratch score cube,
    (2) one vectorized masked softmax over the whole block (cross-head
        pairs masked to -inf before the stabilizer max — a cross-head
        logit far above the same-head max would otherwise underflow the
        real probabilities to fp32 zero; the diagonal is same-head, so
        the masked row max stays finite),
    (3) unrolled per-pixel PV matmuls. Queries arrive pre-scaled."""
    th = q_ref.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (th, th), 0) % num_heads
    jds = jax.lax.broadcasted_iota(jnp.int32, (th, th), 1) % num_heads
    same_head = (ids == jds)[None]

    for p in range(block_p):
        scores[p] = jax.lax.dot_general(
            q_ref[p], k_ref[p], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    s = jnp.where(same_head, scores[:], -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # Unnormalized probs: the 1/denom multiply runs on the [th, dh] PV
    # output instead of the [th, th] probability cube (same epilogue-
    # denominator form as the spatial kernel) — th/dh x less VPU multiply
    # work. The cross-head mask CANNOT move out of the probability tile
    # here (unlike key-pad masking, the masked columns' V rows are real).
    probs[:] = e.astype(probs.dtype)
    inv = 1.0 / jnp.maximum(denom, 1e-30)

    for p in range(block_p):
        o_ref[p] = (jax.lax.dot_general(
            probs[p], v_ref[p], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv[p]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "interpret"))
def temporal_flash_attention(q, k, v, *, num_heads: int, scale: float,
                             interpret: bool = False):
    """q, k, v: [P, T, C] (C = num_heads * dh) -> [P, T, C].

    Per-pixel multi-head attention over the T axis.
    """
    p_total, t, c = q.shape
    dh = c // num_heads
    th = t * num_heads
    q = q * jnp.asarray(scale, q.dtype)

    # Per-pixel VMEM: fp32 scores + probs scratch, plus q/k/v/out blocks
    # double-buffered by the Pallas pipeline.
    per_pixel = (th * th * (4 + q.dtype.itemsize)
                 + 8 * th * dh * q.dtype.itemsize)
    block_p = max(1, _VMEM_BUDGET // per_pixel)
    block_p = min(block_p, p_total)
    p_pad = -(-p_total // block_p) * block_p

    def prep(x):
        x = x.reshape(p_total, th, dh)
        if p_pad != p_total:
            x = jnp.pad(x, [(0, p_pad - p_total), (0, 0), (0, 0)])
        return x

    qr, kr, vr = prep(q), prep(k), prep(v)
    grid = (p_pad // block_p,)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, block_p=block_p),
        out_shape=jax.ShapeDtypeStruct((p_pad, th, dh), q.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block_p, th, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((block_p, th, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_p, th, th), jnp.float32),
            pltpu.VMEM((block_p, th, th), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * th * th * dh,
            bytes_accessed=4 * p_pad * th * dh * q.dtype.itemsize,
            transcendentals=p_pad * th * th,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    if p_pad != p_total:
        out = out[:p_total]
    return out.reshape(p_total, t, c)
