"""Exact-coordinate-semantics image resizing for TPU.

The reference stack mixes three resize conventions that must be reproduced
bit-for-bit for checkpoint parity:

1. torch `F.interpolate(mode='bilinear', align_corners=True)` — used for the
   depth-map upsample (video_depth.py:63,109), DPT fusion-block upsampling
   (util/blocks.py:156-158) and the head's final 14x upsample
   (dpt_temporal.py:94-96).  Coordinates: src = dst*(in-1)/(out-1).
2. torch `F.interpolate(scale_factor=s, mode='bicubic')` — DINOv2 pos-embed
   interpolation (dinov2.py:199-205).  Coordinates: src = (dst+0.5)/s - 0.5
   with the *given* scale factor (the +0.1 offset quirk), cubic A=-0.75,
   border-clamped taps.
3. cv2.resize INTER_CUBIC — frame preprocessing (util/transform.py:113).
   Coordinates: src = (dst+0.5)*in/out - 0.5, cubic A=-0.75, replicate border.

TPU design: all of these are *static-shape* operations under jit, so we
precompute the 1-D interpolation weights with NumPy at trace time and apply
them as separable dense matmuls (MXU) or 2-tap gathers (VPU). No dynamic
shapes, no host round-trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "linear_resize_matrix",
    "cubic_resize_matrix",
    "resize_bilinear_align_corners",
    "resize_bicubic_half_pixel",
    "upsample2x_align_corners",
]


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (same A=-0.75 as torch/cv2)."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def cubic_resize_matrix(in_size: int, out_size: int, scale: float | None = None) -> np.ndarray:
    """[out, in] cubic interpolation matrix with half-pixel coordinates.

    If `scale` is given, src = (dst+0.5)/scale - 0.5 (torch scale_factor
    semantics, dinov2.py:199); otherwise scale = out/in (cv2/torch size
    semantics). Taps are index-clamped to the valid range (replicate border).
    """
    s = float(scale) if scale is not None else out_size / in_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / s - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for k in range(-1, 3):
        idx = np.clip(base + k, 0, in_size - 1)
        w = _cubic_weight(frac - k)
        np.add.at(mat, (rows, idx), w)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=256)
def linear_resize_matrix(in_size: int, out_size: int, align_corners: bool = True,
                         scale: float | None = None) -> np.ndarray:
    """[out, in] bilinear interpolation matrix (1-D separable factor)."""
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * ((in_size - 1) / (out_size - 1)) if out_size > 1 else dst * 0.0
    else:
        s = float(scale) if scale is not None else out_size / in_size
        src = np.clip((dst + 0.5) / s - 0.5, 0.0, None)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - w)
    np.add.at(mat, (rows, hi), w)
    return mat.astype(np.float32)


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """Apply [Ho,H] and [Wo,W] factors to x[..., H, W, C] via MXU matmuls."""
    dt = x.dtype
    a = jnp.asarray(mh, dt)
    b = jnp.asarray(mw, dt)
    # rows: (..., H, W, C) -> (..., Ho, W, C)
    x = jnp.einsum("oh,...hwc->...owc", a, x, preferred_element_type=dt)
    # cols: (..., Ho, W, C) -> (..., Ho, Wo, C)
    x = jnp.einsum("pw,...owc->...opc", b, x, preferred_element_type=dt)
    return x


def resize_bicubic_half_pixel(x: jax.Array, out_hw: tuple[int, int],
                              scale_hw: tuple[float, float] | None = None) -> jax.Array:
    """Bicubic resize of x[..., H, W, C], half-pixel coords, A=-0.75.

    Matches cv2.resize(INTER_CUBIC) when scale_hw is None and
    torch F.interpolate(scale_factor=..., mode='bicubic') when given.
    """
    h, w = x.shape[-3], x.shape[-2]
    ho, wo = out_hw
    sh, sw = (None, None) if scale_hw is None else scale_hw
    return _apply_separable(x, cubic_resize_matrix(h, ho, sh), cubic_resize_matrix(w, wo, sw))


def _gather_lerp_1d(x: jax.Array, axis: int, in_size: int, out_size: int) -> jax.Array:
    """align_corners=True linear resize along one axis via 2-tap gather."""
    dst = np.arange(out_size, dtype=np.float64)
    src = dst * ((in_size - 1) / (out_size - 1)) if out_size > 1 else dst * 0.0
    lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wj = jnp.asarray(w, x.dtype).reshape(shape)
    return x_lo * (1 - wj) + x_hi * wj


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int],
                                  use_matmul: bool | None = None) -> jax.Array:
    """Bilinear align_corners=True resize of x[..., H, W, C].

    Matches torch F.interpolate(mode='bilinear', align_corners=True).
    Small spatial dims go through MXU matmuls; large ones through gathers.
    """
    h, w = x.shape[-3], x.shape[-2]
    ho, wo = out_hw
    if (h, w) == (ho, wo):
        return x
    if use_matmul is None:
        # MXU matmuls beat XLA's mid-axis gathers on TPU for every size this
        # model hits; gathers are only preferable on CPU backends.
        import jax as _jax
        use_matmul = _jax.default_backend() != "cpu" or \
            max(h * ho, w * wo) <= 256 * 256
    if use_matmul:
        return _apply_separable(
            x, linear_resize_matrix(h, ho, True), linear_resize_matrix(w, wo, True)
        )
    x = _gather_lerp_1d(x, x.ndim - 3, h, ho)
    x = _gather_lerp_1d(x, x.ndim - 2, w, wo)
    return x


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """torch F.interpolate(scale_factor=2, align_corners=True) on [...,H,W,C]."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))
