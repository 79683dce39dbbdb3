"""DPT spatial decoder head — functional JAX, NHWC.

Parity with reference dpt.py:47-159 and util/blocks.py:4-162:
4x 1x1 tap projections -> resize layers (ConvT x4, ConvT x2, identity,
conv s2) -> 3x3 "scratch" convs -> RefineNet fusion cascade -> 2-stage
output convs. All upsampling is bilinear align_corners=True.

Param tree mirrors the torch module paths (see utils/torch_convert.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import nn as vnn
from ..ops.resize import resize_bilinear_align_corners


def residual_conv_unit(p, x):
    """ResidualConvUnit (util/blocks.py:37-91): relu-conv-relu-conv + skip."""
    y = jnp.maximum(x, 0)
    y = vnn.conv2d(p["conv1"], y, stride=1, padding=1)
    y = jnp.maximum(y, 0)
    y = vnn.conv2d(p["conv2"], y, stride=1, padding=1)
    return y + x


def feature_fusion_block(p, x, skip=None, size=None):
    """FeatureFusionBlock (util/blocks.py:94-162), align_corners=True.

    size=None means scale_factor=2 (refinenet1, dpt.py:153).
    """
    out = x
    if skip is not None:
        out = out + residual_conv_unit(p["resConfUnit1"], skip)
    out = residual_conv_unit(p["resConfUnit2"], out)
    if size is None:
        size = (2 * out.shape[-3], 2 * out.shape[-2])
    out = resize_bilinear_align_corners(out, size)
    out = vnn.conv2d(p["out_conv"], out, stride=1, padding=0)
    return out


def scratch_rn(p, feats):
    """3x3 no-bias feature harmonization convs (util/blocks.py:20-32)."""
    return [
        vnn.conv2d(p["scratch"][f"layer{i+1}_rn"], f, stride=1, padding=1)
        for i, f in enumerate(feats)
    ]


def output_head(p, path_1, out_hw, fp32_island: bool = True):
    """output_conv1 -> 14x bilinear upsample -> output_conv2 in fp32
    (dpt_temporal.py:93-100: the final convs run outside autocast)."""
    out = vnn.conv2d(p["scratch"]["output_conv1"], path_1, stride=1, padding=1)
    out = resize_bilinear_align_corners(out, out_hw)
    if fp32_island:
        out = out.astype(jnp.float32)
    out = vnn.conv2d(p["scratch"]["output_conv2"]["0"], out, stride=1, padding=1)
    out = jnp.maximum(out, 0)
    out = vnn.conv2d(p["scratch"]["output_conv2"]["2"], out, stride=1, padding=0)
    out = jnp.maximum(out, 0)
    return out  # [N, H14, W14, 1] fp32
