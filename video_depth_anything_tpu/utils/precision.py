"""Precision-drift measurement shared by tests and checkpoint validation.

Relative depth is defined up to an affine map (the reference normalizes
per-frame before loss/metrics, util.py:15-30 and eval.py lstsq alignment),
so low-precision drift is measured after least-squares scale/shift
alignment of the candidate onto the fp32 oracle.
"""
from __future__ import annotations

import numpy as np


def affine_align(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Least-squares (scale, shift) mapping pred -> target, applied."""
    p = pred.astype(np.float64).ravel()
    t = target.astype(np.float64).ravel()
    a = np.stack([p, np.ones_like(p)], axis=1)
    coef, *_ = np.linalg.lstsq(a, t, rcond=None)
    return (pred.astype(np.float64) * coef[0] + coef[1]).astype(np.float32)


def precision_drift_report(candidate: np.ndarray, oracle_fp32: np.ndarray) -> dict:
    """Max/mean aligned error as fractions of the oracle's depth range."""
    aligned = affine_align(candidate, oracle_fp32)
    rng = float(oracle_fp32.max() - oracle_fp32.min())
    rng = max(rng, 1e-12)
    err = np.abs(aligned - oracle_fp32)
    return {
        "max_err_frac": float(err.max() / rng),
        "mean_err_frac": float(err.mean() / rng),
        "depth_range": rng,
    }
