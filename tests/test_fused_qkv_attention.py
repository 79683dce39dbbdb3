"""Fused-qkv attention kernel vs the separate-projection reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.ops.attention import _xla_mha
from video_depth_anything_tpu.ops.pallas_attention import (
    flash_attention_qkv_fused,
)


@pytest.mark.parametrize("b,s,h,d", [(2, 300, 6, 64), (1, 1370, 2, 64)])
def test_fused_qkv_matches_xla(b, s, h, d):
    rng = np.random.default_rng(0)
    c = h * d
    scale = d ** -0.5
    q = rng.standard_normal((b, s, c)).astype(np.float32)
    k = rng.standard_normal((b, s, c)).astype(np.float32)
    v = rng.standard_normal((b, s, c)).astype(np.float32)
    qkv = jnp.asarray(np.concatenate([q * scale, k, v], axis=-1))

    qh = jnp.asarray(q).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = jnp.asarray(k).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = jnp.asarray(v).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = _xla_mha(qh, kh, vh, scale).transpose(0, 2, 1, 3).reshape(b, s, c)

    got = flash_attention_qkv_fused(qkv, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_qkv_fallback_odd_heads():
    """Odd head counts route through the generic packed fallback."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 64, 3, 64
    c = h * d
    scale = d ** -0.5
    q = rng.standard_normal((b, s, c)).astype(np.float32)
    k = rng.standard_normal((b, s, c)).astype(np.float32)
    v = rng.standard_normal((b, s, c)).astype(np.float32)
    qkv = jnp.asarray(np.concatenate([q * scale, k, v], axis=-1))
    qh = jnp.asarray(q).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = jnp.asarray(k).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = jnp.asarray(v).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = _xla_mha(qh, kh, vh, scale).transpose(0, 2, 1, 3).reshape(b, s, c)
    got = flash_attention_qkv_fused(qkv, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
