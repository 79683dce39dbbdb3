"""Frame preprocessing — device-side, fused, static shapes.

Replicates the reference host-side transform chain
(util/transform.py:5-157 + video_depth.py:168-185) but runs it on the TPU:
uint8 -> /255 -> bicubic lower-bound multiple-of-14 resize (cv2 INTER_CUBIC
semantics, as separable MXU matmuls) -> ImageNet normalize. The per-frame
cv2 loop in the reference (video_depth.py:195-199) was a host hotspot; here
it is part of the jitted window graph.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import IMAGENET_MEAN, IMAGENET_STD
from ..ops.resize import resize_bicubic_half_pixel


def effective_input_size(frame_h: int, frame_w: int, input_size: int = 518) -> int:
    """Aspect-ratio guard (video_depth.py:168-171): shrink for ratio > 1.78."""
    ratio = max(frame_h, frame_w) / min(frame_h, frame_w)
    if ratio > 1.78:
        input_size = int(input_size * 1.777 / ratio)
        input_size = round(input_size / 14) * 14
    return input_size


def _constrain(x: float, multiple: int, min_val: int) -> int:
    """Resize.constrain_to_multiple_of (transform.py:51-60), min_val branch."""
    y = int(np.round(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def network_input_hw(frame_h: int, frame_w: int, input_size: int) -> tuple[int, int]:
    """Resize.get_size lower_bound + multiple-of-14 (transform.py:62-107)."""
    scale_h = input_size / frame_h
    scale_w = input_size / frame_w
    scale = max(scale_h, scale_w)  # lower_bound: output at least input_size
    new_h = _constrain(scale * frame_h, 14, input_size)
    new_w = _constrain(scale * frame_w, 14, input_size)
    return new_h, new_w


def preprocess_frames(frames, out_hw: tuple[int, int], dtype=jnp.float32):
    """frames: [..., H, W, 3] uint8 or float in [0,1] -> normalized [..., h, w, 3].

    Resize runs in fp32 for cv2 parity, then casts to the compute dtype.
    """
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    x = resize_bicubic_half_pixel(x, out_hw)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)
