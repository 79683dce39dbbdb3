"""Sliding-window frame indexing — closed form, windows are parallel.

The reference builds each 32-frame window sequentially, overwriting the
first OVERLAP inputs with the previous window's KEYFRAMES *inputs*
(video_depth.py:195-201). Because the dependency is on inputs (not model
outputs), every window's source-frame indices are computable up front,
which is what lets the TPU build batch windows across the mesh instead of
looping: window k's input only ever references original frames
  [0, (k-1)*22+12, (k-1)*22+24..31, k*22+10 .. k*22+31]
(clamped to the last frame, which is how the reference's tail padding with
copies of the final frame behaves).
"""
from __future__ import annotations

import numpy as np

from ..config import FRAME_STEP, INFER_LEN, KEYFRAMES


def num_windows(video_len: int) -> int:
    """Number of 32-frame windows (reference loop at video_depth.py:195)."""
    return -(-video_len // FRAME_STEP)


def window_indices(video_len: int) -> np.ndarray:
    """[K, 32] int32 source-frame indices for every window."""
    k = num_windows(video_len)
    idx = np.zeros((k, INFER_LEN), dtype=np.int32)
    idx[0] = np.arange(INFER_LEN)
    kf = np.asarray(KEYFRAMES)
    for i in range(1, k):
        idx[i, : len(kf)] = idx[i - 1, kf]
        idx[i, len(kf):] = i * FRAME_STEP + np.arange(len(kf), INFER_LEN)
    return np.minimum(idx, video_len - 1)
