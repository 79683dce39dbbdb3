"""DPT spatial decoder head — functional JAX, NHWC.

Parity with reference dpt.py:47-159 and util/blocks.py:4-162:
4x 1x1 tap projections -> resize layers (ConvT x4, ConvT x2, identity,
conv s2) -> 3x3 "scratch" convs -> RefineNet fusion cascade -> 2-stage
output convs. All upsampling is bilinear align_corners=True.

Param tree mirrors the torch module paths (see utils/torch_convert.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn as vnn
from ..ops.resize import resize_bilinear_align_corners


def _batch_norm(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm2d over channels-last (running statistics)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def residual_conv_unit(p, x, use_bn: bool = False,
                       use_pallas: bool | None = None):
    """ResidualConvUnit (util/blocks.py:37-91): relu-conv[-bn]-relu-conv[-bn] + skip.

    use_pallas=True opts into the fused implicit-GEMM Pallas kernel
    (ops/pallas_conv.py). It is NOT the default: measured on v5e
    (tools/bench_rcu.py, 32x148x148x256 bf16) the kernel runs at ~80 TF/s
    vs XLA's ~110 TF/s — XLA's conv emitter already overlaps its epilogue
    sweeps with the MXU, while the kernel's fp32 tap accumulation and
    shift copies serialize against the matmuls (same Mosaic phase
    plateau the flash kernel hits). Kept as a measured negative result.
    """
    if use_pallas:
        from ..ops.pallas_conv import fused_rcu, rcu_supported
        if rcu_supported(x, use_bn):
            return fused_rcu(p, x)
    y = jnp.maximum(x, 0)
    y = vnn.conv2d(p["conv1"], y, stride=1, padding=1)
    if use_bn:
        y = _batch_norm(p["bn1"], y)
    y = jnp.maximum(y, 0)
    y = vnn.conv2d(p["conv2"], y, stride=1, padding=1)
    if use_bn:
        y = _batch_norm(p["bn2"], y)
    return y + x


def feature_fusion_block(p, x, skip=None, size=None, use_bn: bool = False,
                         use_pallas: bool | None = None):
    """FeatureFusionBlock (util/blocks.py:94-162), align_corners=True.

    size=None means scale_factor=2 (refinenet1, dpt.py:153).
    """
    out = x
    if skip is not None:
        out = out + residual_conv_unit(p["resConfUnit1"], skip, use_bn,
                                       use_pallas)
    out = residual_conv_unit(p["resConfUnit2"], out, use_bn, use_pallas)
    # The reference applies the 1x1 out_conv AFTER the 2x upsample
    # (util/blocks.py:152-158). A 1x1 conv is a pointwise affine channel
    # map and align-corners bilinear weights sum to 1, so the two commute
    # exactly (conv(resize(x)) == resize(conv(x)) incl. the bias term);
    # running the conv at the pre-upsample resolution costs 4x fewer FLOPs.
    out = vnn.conv2d(p["out_conv"], out, stride=1, padding=0)
    if size is None:
        size = (2 * out.shape[-3], 2 * out.shape[-2])
    return resize_bilinear_align_corners(out, size)


def scratch_rn(p, feats):
    """3x3 no-bias feature harmonization convs (util/blocks.py:20-32)."""
    return [
        vnn.conv2d(p["scratch"][f"layer{i+1}_rn"], f, stride=1, padding=1)
        for i, f in enumerate(feats)
    ]


# Opt-in: route even-sized mixed-island tails through the space-to-depth
# conv form below (measured slower end to end on v5e; see output_head).
USE_S2D_TAIL = False

# Tap maps for the space-to-depth form of a 3x3 stride-1 pad-1 conv.
# Output phase p (row parity) at conv output index m (window = cells
# m-1, m, zero-padded) serves pixel row 2m-p... tap (wi, ph) supplies
# row offset di = 2*wi + ph - 2 + p; the maps keep taps with di in
# {-1, 0, 1} and give the original kernel row index di + 1.
_S2D_TAPS = {0: {(0, 1): 0, (1, 0): 1, (1, 1): 2},
             1: {(0, 0): 0, (0, 1): 1, (1, 0): 2}}


def _s2d_kernel(k):
    """[3,3,C,Co] conv kernel -> [2,2,4C,4Co] operating on 2x2
    space-to-depth cells (input channels (pH,pW,C), output (p,q,Co))."""
    _, _, c, co = k.shape
    k2 = jnp.zeros((2, 2, 2, 2, c, 2, 2, co), k.dtype)
    for p in (0, 1):
        for (wi, ph), di in _S2D_TAPS[p].items():
            for q in (0, 1):
                for (wj, pw), dj in _S2D_TAPS[q].items():
                    k2 = k2.at[wi, wj, ph, pw, :, p, q, :].set(k[di, dj])
    return k2.reshape(2, 2, 4 * c, 4 * co)


def _tail_s2d(w2, w3, u):
    """The head tail — 3x3 conv (C->32) + bias + ReLU + 1x1 conv (32->1) +
    bias + ReLU — on even-sized u [N,H,W,C], computed in 2x2 space-to-depth
    form. Exact restructure of the pixel-space computation:

    A 3x3 conv to 32 output channels uses 32 of the MXU's 128 lanes
    (~62 TF/s measured at 518^2). Folding each 2x2 pixel block into
    channels turns it into a 2x2 conv over H/2 x W/2 cells with 4C inputs
    and 4*32=128 outputs — full-lane MXU (the 2x2x4C kernel holds the
    original 9 taps scattered by phase parity; the structural zeros
    contribute exact-zero partial sums). The window covering cells
    (s, s+1) with padding (1,1) serves output phase 0 at cell s+1 and
    phase 1 at cell s, so the two phase planes read the conv output at a
    one-cell offset, and the tail's ReLU/1x1-reduction runs in phase
    space on the quarter-size grid before depth-to-space.
    """
    n, h, wd, c = u.shape
    a, b = h // 2, wd // 2
    z = (u.reshape(n, a, 2, b, 2, c).transpose(0, 1, 3, 2, 4, 5)
         .reshape(n, a, b, 4 * c))
    k2 = _s2d_kernel(w2["w"]).astype(z.dtype)
    out = jax.lax.conv_general_dilated(
        z, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)  # [n, a+1, b+1, (p,q,32)]
    co = w2["w"].shape[-1]
    out = jnp.maximum(out + jnp.tile(w2["b"].astype(jnp.float32), 4), 0)
    out = out.astype(jnp.bfloat16)
    w3v = jnp.tile(w3["w"].astype(jnp.float32).reshape(-1), 4)
    out = jnp.sum((out.astype(jnp.float32) * w3v)
                  .reshape(n, a + 1, b + 1, 4, co), axis=-1)
    out = jnp.maximum(out + w3["b"].astype(jnp.float32), 0)
    # depth-to-space: phase p reads cells [p : a+p] (ditto q).
    yy = jnp.stack(
        [jnp.stack([out[:, p:a + p, q:b + q, 2 * p + q] for q in (0, 1)],
                   axis=-1) for p in (0, 1)], axis=-2)  # [n, a, b, p, q]
    return yy.transpose(0, 1, 3, 2, 4).reshape(n, h, wd)[..., None]


def output_head(p, path_1, out_hw, fp32_island: bool = True,
                mixed_island: bool = True):
    """output_conv1 -> 14x bilinear upsample -> output_conv2 fp32 island
    (dpt_temporal.py:93-100: the final convs run outside autocast).

    bf16 variant of the island (mixed_island): the reference's fp32 island
    guards against fp16's narrow exponent; bf16 shares fp32's exponent, so
    the 3x3 conv at full output resolution (the expensive one) keeps bf16
    storage with fp32 MXU accumulation, and only the cheap tail (ReLU +
    1x1 conv) runs in fp32. Full-fp32 inputs take the exact reference path,
    and training disables the mixed conv (its bf16-in/fp32-out form has no
    AD transpose) in favor of the reference's full fp32 island.
    """
    out = vnn.conv2d(p["scratch"]["output_conv1"], path_1, stride=1, padding=1)
    out = resize_bilinear_align_corners(out, out_hw)
    if fp32_island and (out.dtype == jnp.float32 or not mixed_island):
        out = vnn.conv2d(p["scratch"]["output_conv2"]["0"],
                         out.astype(jnp.float32), stride=1, padding=1)
        out = jnp.maximum(out, 0).astype(jnp.float32)
        out = vnn.conv2d(p["scratch"]["output_conv2"]["2"], out,
                         stride=1, padding=0)
        return jnp.maximum(out, 0)  # [N, H14, W14, 1] fp32
    # Mixed island: both output convs accumulate in fp32 on the MXU (bf16
    # shares fp32's exponent range, the property the reference's fp16
    # island protects), but the full-resolution intermediates store bf16,
    # halving the tail's HBM traffic. Budgeted end to end by
    # tests/test_precision_budget.py.
    w = p["scratch"]["output_conv2"]["0"]
    w2 = p["scratch"]["output_conv2"]["2"]
    if USE_S2D_TAIL and out.shape[-3] % 2 == 0 and out.shape[-2] % 2 == 0:
        # 2x2 space-to-depth tail — measured NEGATIVE on v5e at 518^2
        # (12.19 vs 11.66 ms/frame vitl): the full-lane 2x2 conv does win,
        # but the s2d transpose + phase-slice/stack HBM passes around it
        # cost more than the 32-lane conv wastes. Kept opt-in, tested
        # (tests/test_output_head.py), off by default.
        return _tail_s2d(w, w2, out)
    out = jax.lax.conv_general_dilated(
        out, w["w"].astype(out.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = jnp.maximum(out + w["b"].astype(jnp.float32), 0).astype(jnp.bfloat16)
    # The final 1x1 conv has ONE output channel — as a matmul it uses 1 of
    # the MXU's 128 lanes (~3 TF/s measured, ~5 ms/window at 518^2). A
    # broadcast-multiply + lane reduction does the same contraction on the
    # VPU at HBM speed (reads the [*, 32] tensor once). fp32 accumulation
    # either way.
    out = jnp.sum(out.astype(jnp.float32)
                  * w2["w"].astype(jnp.float32).reshape(-1), axis=-1,
                  keepdims=True)
    out = out + w2["b"].astype(jnp.float32)
    return jnp.maximum(out, 0)  # [N, H14, W14, 1] fp32
