"""Temporal motion modules — per-pixel attention over the time axis.

Parity with reference motion_module/motion_module.py:32-297 and
motion_module/attention.py:30-429: GroupNorm(32, eps 1e-6) -> proj_in ->
N x (2 x TemporalAttention + GEGLU FF, LayerNorm eps 1e-5) -> zero-init
proj_out + residual. Tokens are the T frames at each spatial position.

TPU regime: seq = T (<=32), batch = B*H*W — a 32x32 score matrix per pixel.
Flash tiling buys nothing here; the whole block is plain batched matmuls
that XLA fuses (the reference's xformers batch-split at 65535,
attention.py:275-293, is unnecessary).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops import nn as vnn
from ..ops import quant as quant_ops
from ..ops.attention import temporal_mha


def sinusoidal_pe(d_model: int, max_len: int) -> np.ndarray:
    """APE table (motion_module.py:180-198): pe[0,:,0::2]=sin, 1::2=cos."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((1, max_len, d_model), dtype=np.float64)
    pe[0, :, 0::2] = np.sin(position * div)
    pe[0, :, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


def rope_freqs_cis(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    """RoPE table (attention.py:403-408) as [end, dim//2] complex64."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    return (np.cos(angles) + 1j * np.sin(angles)).astype(np.complex64)


def _apply_rope(x, freqs_cis):
    """x: [B, T, C] -> rotate pairs (attention.py:419-429)."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, c // 2, 2)
    xc = xf[..., 0] + 1j * xf[..., 1]
    fc = jnp.asarray(freqs_cis)[None, :t, :]
    out = xc * fc
    out = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1).reshape(b, t, c)
    return out.astype(x.dtype)


def _temporal_attention(p, x, num_heads: int, pe: str,
                        use_pallas: bool | None = None,
                        collect_stats: bool = False, stats: dict = None):
    """TemporalAttention.forward (motion_module.py:230-297) on [BD, T, C].

    When p carries a "qs" leaf (ops/quant.py::quantize_motion_module) the
    q/k/v/out projections run w8a8 int8 — q/k/v share one quantized input.
    With collect_stats, activation absmaxes land in `stats`.
    """
    import jax

    bd, t, c = x.shape
    if pe == "ape":
        x = x + p["pos_encoder"]["pe"][:, :t].astype(x.dtype)
    qs = p.get("qs")
    if collect_stats:
        stats["qkv"] = quant_ops.amax(x)
    if qs is not None:
        xq = quant_ops.quant_act(x, qs["qkv"])
        q = quant_ops.qlinear(p["to_q"], xq, qs["qkv"], x.dtype)
        k = quant_ops.qlinear(p["to_k"], xq, qs["qkv"], x.dtype)
        v = quant_ops.qlinear(p["to_v"], xq, qs["qkv"], x.dtype)
    else:
        q = vnn.linear(p["to_q"], x)
        k = vnn.linear(p["to_k"], x)
        v = vnn.linear(p["to_v"], x)
    if pe == "rope":
        q = _apply_rope(q, p["_freqs_cis"])
        k = _apply_rope(k, p["_freqs_cis"])
    dh = c // num_heads
    scale = dh ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and dh >= 64:
        # (frame,head)-flattened attention: 8x-inflated softmax buys
        # full-width MXU matmuls — a clear win at dh>=64 (C=1024 modules).
        # XLA einsum form: the equivalent Pallas kernel
        # (ops/pallas_temporal_attention.py) measured ~1.5 ms/call SLOWER
        # in-model from custom-call fusion barriers (bench_ablate --temporal).
        from ..ops.attention import temporal_flat_attention
        o = temporal_flat_attention(q, k, v, num_heads=num_heads,
                                    scale=scale)
    elif (use_pallas and dh < 64 and 128 % dh == 0
          and num_heads % (128 // dh) == 0):
        # Small-head regime (dh=32, C=256 modules): flattening all heads
        # makes the softmax VPU-bound, so flatten only groups of g heads
        # such that g*dh = 128 — each group is a contiguous channel slice,
        # and groups batch into the pixel axis.
        from ..ops.attention import temporal_flat_attention
        g = 128 // dh
        ng = num_heads // g
        def to_groups(x):
            return (x.reshape(bd, t, ng, g * dh).transpose(0, 2, 1, 3)
                    .reshape(bd * ng, t, g * dh))
        o = temporal_flat_attention(to_groups(q), to_groups(k), to_groups(v),
                                    num_heads=g, scale=scale)
        o = (o.reshape(bd, ng, t, g * dh).transpose(0, 2, 1, 3)
             .reshape(bd, t, c))
    else:
        q = q.reshape(bd, t, num_heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(bd, t, num_heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(bd, t, num_heads, dh).transpose(0, 2, 1, 3)
        o = temporal_mha(q, k, v).transpose(0, 2, 1, 3).reshape(bd, t, c)
    if collect_stats:
        stats["out"] = quant_ops.amax(o)
    if qs is not None:
        return quant_ops.linear_maybe_q(p["to_out"]["0"], o, qs["out"])
    return vnn.linear(p["to_out"]["0"], o)


def _col_slice(p, lo, hi):
    """Output-column slice of a (possibly int8-quantized) linear site.

    Weight quantization is per-out-channel (ops/quant.py:33-42), so slicing
    w/w_i8/ws/b along N is exact for both the float and int8 paths.
    """
    return {k: (v[..., lo:hi] if k in ("w", "w_i8", "ws", "b") else v)
            for k, v in p.items()}


def _geglu_ff(p, x, collect_stats: bool = False, stats: dict = None):
    """FeedForward GEGLU (attention.py:296-400): x*gelu(gate) -> linear.

    The reference computes one [*, 8C] projection then chunks it in two
    (attention.py:355-360). Here the projection runs as two [*, 4C]
    column-slice matmuls over the same weights — identical per-element dot
    products — so XLA fuses `val * gelu(gate)` into the dots' epilogue
    instead of materializing the 8C intermediate (the largest activation in
    the temporal stack, ~0.7 GB/window for the C=1024 modules at 518^2).
    """
    qs = p.get("qs")
    if collect_stats:
        stats["ff_proj"] = quant_ops.amax(x)
    proj = p["net"]["0"]["proj"]
    n8 = (proj["w"] if "w" in proj else proj["w_i8"]).shape[-1]
    amax = qs["ff_proj"] if qs else None
    x_i8 = quant_ops.quant_act(x, amax) if qs else None
    val = quant_ops.linear_maybe_q(_col_slice(proj, 0, n8 // 2), x,
                                   amax, x_i8=x_i8)
    gate = quant_ops.linear_maybe_q(_col_slice(proj, n8 // 2, n8), x,
                                    amax, x_i8=x_i8)
    h = val * vnn.gelu(gate)
    if collect_stats:
        stats["ff_g"] = quant_ops.amax(h)
    return quant_ops.linear_maybe_q(p["net"]["2"], h,
                                    qs["ff_g"] if qs else None)


def _transformer_block(p, x, num_heads: int, pe: str,
                       num_attention_blocks: int = 2,
                       collect_stats: bool = False, stats: dict = None):
    """TemporalTransformerBlock (motion_module.py:129-177) on [B*HW, T, C].

    The reference keeps tokens in (b f) d c layout and rearranges to
    (b d) f c around every attention call (motion_module.py:232). Every op
    between the module's proj_in and proj_out — LayerNorm, the GEGLU FF,
    the residual adds — is per-token, so this block instead runs entirely
    in the attention-native [B*HW, T, C] layout (the caller transposes once
    on entry and once on exit): per-row math is unchanged bit for bit, and
    2 of the 4 full-tensor HBM transpose passes per attention block vanish.
    """
    for i in range(num_attention_blocks):
        y = vnn.layer_norm(p["norms"][str(i)], x, eps=1e-5)
        ast = {} if collect_stats else None
        y = _temporal_attention(p["attention_blocks"][str(i)], y, num_heads,
                                pe, collect_stats=collect_stats, stats=ast)
        if collect_stats:
            stats.setdefault("attn", {})[str(i)] = ast
        x = x + y
    x = x + _geglu_ff(p["ff"], vnn.layer_norm(p["ff_norm"], x, eps=1e-5),
                      collect_stats=collect_stats, stats=stats)
    return x


def temporal_module(p, x, b: int, t: int, num_heads: int = 8, pe: str = "ape",
                    num_transformer_block: int = 1, num_attention_blocks: int = 2,
                    collect_stats: bool = False):
    """TemporalModule on NHWC features x: [B*T, H, W, C] -> same shape.

    GroupNorm -> proj_in -> transformer blocks -> proj_out + residual
    (motion_module.py:102-126). With collect_stats, returns (out, stats)
    where stats carries the activation absmaxes that
    ops/quant.py::quantize_motion_module turns into static int8 scales.
    """
    tt = p["temporal_transformer"]
    qs = tt.get("qs")
    stats = {} if collect_stats else None
    bt, h, w, c = x.shape
    residual = x
    y = vnn.group_norm(tt["norm"], x, num_groups=32, eps=1e-6)
    y = y.reshape(bt, h * w, c)
    if collect_stats:
        stats["proj_in"] = quant_ops.amax(y)
    y = quant_ops.linear_maybe_q(tt["proj_in"], y,
                                 qs["proj_in"] if qs else None)
    # One layout change for the whole transformer stack: (b f) d c ->
    # (b d) f c (motion_module.py:232). The blocks stay in attention-native
    # [B*HW, T, C]; everything between here and proj_out is per-token.
    hw = h * w
    y = y.reshape(b, t, hw, c).transpose(0, 2, 1, 3).reshape(b * hw, t, c)
    for i in range(num_transformer_block):
        bst = {} if collect_stats else None
        y = _transformer_block(tt["transformer_blocks"][str(i)], y,
                               num_heads, pe, num_attention_blocks,
                               collect_stats=collect_stats, stats=bst)
        if collect_stats:
            stats.setdefault("blocks", {})[str(i)] = bst
    y = y.reshape(b, hw, t, c).transpose(0, 2, 1, 3).reshape(b * t, hw, c)
    if collect_stats:
        stats["proj_out"] = quant_ops.amax(y)
    y = quant_ops.linear_maybe_q(tt["proj_out"], y,
                                 qs["proj_out"] if qs else None)
    out = y.reshape(bt, h, w, c) + residual
    return (out, stats) if collect_stats else out
