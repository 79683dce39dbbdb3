"""Stitching math vs a float64 oracle of the reference formulas."""
import numpy as np

import jax.numpy as jnp

from video_depth_anything_tpu.pipeline.stitch import (
    _fade_weights,
    compute_scale_and_shift,
    stitch_first,
    stitch_step,
)


def _ref_scale_shift_f64(p, t):
    """utils/util.py:40-62 normal equations, in float64."""
    p = p.astype(np.float64)
    t = t.astype(np.float64)
    a00 = (p * p).sum()
    a01 = p.sum()
    a11 = p.size
    b0 = (p * t).sum()
    b1 = t.sum()
    det = a00 * a11 - a01 * a01
    if det == 0:
        return 1.0, 0.0
    return (a11 * b0 - a01 * b1) / det, (-a01 * b0 + a00 * b1) / det


def test_scale_shift_well_conditioned():
    rng = np.random.default_rng(0)
    t = rng.random((2, 16, 16)).astype(np.float32) * 5
    p = (t * 0.7 + 0.3 + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    s_ref, b_ref = _ref_scale_shift_f64(p, t)
    s, b = compute_scale_and_shift(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-5)
    np.testing.assert_allclose(float(b), b_ref, rtol=1e-4, atol=1e-6)


def test_scale_shift_ill_conditioned_beats_fp32_normal_equations():
    """Low-variance depth (the regime that breaks the raw fp32 form)."""
    rng = np.random.default_rng(1)
    base = 0.04 + 0.002 * rng.standard_normal((2, 64, 64))
    t = base.astype(np.float32)
    p = (base * 1.1 - 0.001).astype(np.float32)
    s_ref, b_ref = _ref_scale_shift_f64(p, t)
    s, b = compute_scale_and_shift(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-3)
    np.testing.assert_allclose(float(b), b_ref, rtol=1e-3, atol=1e-7)


def test_scale_shift_degenerate_constant_prediction():
    p = np.full((2, 8, 8), 3.0, np.float32)
    t = np.linspace(0, 1, p.size).reshape(p.shape).astype(np.float32)
    s, b = compute_scale_and_shift(jnp.asarray(p), jnp.asarray(t))
    assert float(s) == 1.0 and float(b) == 0.0  # det==0 fallback (util.py:53-58)


def test_fade_weights():
    np.testing.assert_allclose(_fade_weights(),
                               [0, 1/7, 2/7, 3/7, 4/7, 5/7, 6/7, 1], atol=1e-7)


def test_stitch_step_metric_identity():
    """Metric model: scale,shift pinned to 1,0 — only clamp + fade apply."""
    rng = np.random.default_rng(2)
    d0 = jnp.asarray(rng.random((32, 6, 6)).astype(np.float32))
    d1 = jnp.asarray(rng.random((32, 6, 6)).astype(np.float32))
    carry, _ = stitch_first(d0)
    carry2, emit = stitch_step(carry, d1, metric=True)
    w = _fade_weights()[:, None, None]
    expect_fade = np.asarray(carry[2]) * (1 - w) + np.asarray(d1[2:10]) * w
    np.testing.assert_allclose(np.asarray(emit[:8]), expect_fade, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(emit[8:]), np.asarray(d1[10:24]), rtol=1e-6)
