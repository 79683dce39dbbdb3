"""Space-to-depth output-head tail vs the plain pixel-space computation.

The mixed-precision (bf16) island routes even-sized maps through
models/dpt.py::_tail_s2d (full-lane MXU form of the 3x3 C->32 conv).
The CPU model-parity suite runs the fp32 island, so this pins the s2d
restructure directly against the reference pixel-space ops.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.models import dpt


def _plain_tail(w2, w3, u):
    out = jax.lax.conv_general_dilated(
        u, w2["w"].astype(u.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = jnp.maximum(out + w2["b"].astype(jnp.float32), 0)
    out = out.astype(jnp.bfloat16).astype(jnp.float32)
    out = out @ w3["w"].astype(jnp.float32).reshape(-1, 1)
    out = out + w3["b"].astype(jnp.float32)
    return jnp.maximum(out, 0)


@pytest.mark.parametrize("h,w,c,co", [(20, 24, 16, 32), (14, 14, 8, 4)])
def test_tail_s2d_matches_pixel_space(h, w, c, co):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.bfloat16)
    w2 = {"w": jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1,
                           jnp.float32),
          "b": jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)}
    w3 = {"w": jnp.asarray(rng.standard_normal((1, 1, co, 1)) * 0.1,
                           jnp.float32),
          "b": jnp.asarray(rng.standard_normal((1,)) * 0.1, jnp.float32)}

    ref = np.asarray(_plain_tail(w2, w3, u))
    got = np.asarray(dpt._tail_s2d(w2, w3, u))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


def test_tail_s2d_border_exactness():
    """Zero-padding in cell space must reproduce pixel-space padding at
    every border, so check a delta at each corner/edge in fp32."""
    c, co = 4, 8
    for pos in [(0, 0), (0, 5), (5, 0), (9, 11), (4, 11), (9, 6)]:
        u_np = np.zeros((1, 10, 12, c), np.float32)
        u_np[0, pos[0], pos[1], 2] = 1.0
        u = jnp.asarray(u_np)
        rng = np.random.default_rng(1)
        w2 = {"w": jnp.asarray(rng.standard_normal((3, 3, c, co)),
                               jnp.float32),
              "b": jnp.zeros((co,), jnp.float32)}
        w3 = {"w": jnp.asarray(rng.standard_normal((1, 1, co, 1)),
                               jnp.float32),
              "b": jnp.zeros((1,), jnp.float32)}
        ref = np.asarray(_plain_tail(w2, w3, u))
        got = np.asarray(dpt._tail_s2d(w2, w3, u))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"delta at {pos}")
