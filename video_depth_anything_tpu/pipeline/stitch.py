"""Cross-window depth stitching — in-graph lax.scan, fp32.

Replicates the reference's host-side NumPy alignment pass
(video_depth.py:216-254 + utils/util.py:16-74) as a jitted scan so long
videos stream through the device without per-window host round-trips:

- per window, a closed-form 2x2 least-squares fit aligns the window's first
  ALIGN_LEN(=2) depth frames against rolling references (anchor frame 0 and
  the previous window's keyframe-12 output), giving (scale, shift);
- the 8 overlap frames are linearly cross-faded between the previous
  window's tail and the new window's aligned outputs;
- the metric model pins scale, shift = 1, 0
  (metric_depth/video_depth_anything/video_depth.py:132) but keeps the
  clamp + cross-fade.

Scan carry: (ref0 [H,W], ref1 [H,W], tail8 [8,H,W]). Step input: one
window's depths [32,H,W]. Step output: 22 finalized frames. The first
window contributes 24 frames up front and the final tail8 is flushed at
the end: total 24 + 22*(K-1) + 8 = 22K + 10 frames, trimmed to video_len.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ALIGN_LEN, INTERP_LEN, KEYFRAMES, OVERLAP


def compute_scale_and_shift(prediction, target):
    """Closed-form affine lstsq (utils/util.py:40-62, all-ones mask), fp32.

    Uses the centered (covariance) form — algebraically identical to the
    reference's normal-equation determinant but numerically stable in fp32:
    the raw sum-of-squares form loses ~3 digits when depth variance is small
    relative to its mean, which compounds across hundreds of windows
    (SURVEY.md §7 "hard parts").
    """
    p = prediction.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mp = jnp.mean(p)
    mt = jnp.mean(t)
    dp = p - mp
    var_p = jnp.mean(dp * dp)
    cov = jnp.mean(dp * (t - mt))
    ok = var_p > 0
    scale = jnp.where(ok, cov / jnp.where(ok, var_p, 1.0), 1.0)
    shift = jnp.where(ok, mt - scale * mp, 0.0)
    return scale, shift


def _fade_weights() -> np.ndarray:
    """Cross-fade weights [0, 1/7, ..., 6/7, 1] (utils/util.py:65-74)."""
    step = 1.0 / (INTERP_LEN - 1)
    return np.array([0.0] + [i * step for i in range(1, INTERP_LEN - 1)] + [1.0],
                    dtype=np.float32)


def stitch_step(carry, depths, metric: bool = False):
    """One window. depths: [32, H, W] fp32 -> emits 22 finalized frames."""
    ref0, ref1, tail8 = carry
    if metric:
        scale = jnp.float32(1.0)
        shift = jnp.float32(0.0)
    else:
        pred = jnp.stack([depths[0], depths[1]])          # curr_align
        targ = jnp.stack([ref0, ref1])                    # ref_align
        scale, shift = compute_scale_and_shift(pred, targ)
    aligned = jnp.maximum(depths * scale + shift, 0.0)

    w = jnp.asarray(_fade_weights())[:, None, None]
    faded = tail8 * (1.0 - w) + aligned[ALIGN_LEN:OVERLAP] * w

    emit = jnp.concatenate([faded, aligned[OVERLAP:OVERLAP + 14]], axis=0)  # 22
    new_carry = (ref0, aligned[KEYFRAMES[1]], aligned[-INTERP_LEN:])
    return new_carry, emit


def stitch_first(depths0):
    """Window 0 (video_depth.py:223-226): raw, seeds the references."""
    carry = (depths0[0], depths0[KEYFRAMES[1]], depths0[-INTERP_LEN:])
    emit = depths0[: OVERLAP + 14]  # frames 0..23
    return carry, emit
