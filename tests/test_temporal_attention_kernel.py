"""Temporal-attention Pallas kernel (head-mask trick) vs the einsum path."""
import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.ops.attention import temporal_mha
from video_depth_anything_tpu.ops.pallas_temporal_attention import (
    temporal_flash_attention,
)


@pytest.mark.parametrize("p,t,h,dh", [(100, 32, 8, 32), (37, 16, 8, 128),
                                      (5, 4, 2, 16)])
def test_matches_einsum_attention(p, t, h, dh):
    rng = np.random.default_rng(0)
    c = h * dh
    q = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    scale = dh ** -0.5

    qh = q.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    ref = temporal_mha(qh, kh, vh, scale)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(p, t, c))

    got = np.asarray(temporal_flash_attention(q, k, v, num_heads=h,
                                              scale=scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_head_isolation():
    """Cross-head leakage would show up when one head's values explode."""
    rng = np.random.default_rng(1)
    p, t, h, dh = 3, 8, 4, 16
    c = h * dh
    q = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    v_np = rng.standard_normal((p, t, c)).astype(np.float32)
    v_np[:, :, :dh] = 1e4  # head 0 values huge
    v = jnp.asarray(v_np)
    out = np.asarray(temporal_flash_attention(q, k, v, num_heads=h,
                                              scale=dh ** -0.5, interpret=True))
    # heads 1..3 must be unaffected by head 0's magnitude
    assert np.abs(out[:, :, dh:]).max() < 100


@pytest.mark.parametrize("p,t,h,dh", [(100, 32, 8, 32), (37, 16, 8, 128),
                                      (5, 4, 2, 16)])
def test_flat_xla_matches_einsum_attention(p, t, h, dh):
    """temporal_flat_attention (the TPU in-model path) vs per-head einsum."""
    from video_depth_anything_tpu.ops.attention import temporal_flat_attention
    rng = np.random.default_rng(2)
    c = h * dh
    q = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    scale = dh ** -0.5

    qh = q.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(p, t, h, dh).transpose(0, 2, 1, 3)
    ref = temporal_mha(qh, kh, vh, scale)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(p, t, c))

    got = np.asarray(temporal_flat_attention(q, k, v, num_heads=h,
                                             scale=scale))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_flat_xla_head_isolation():
    from video_depth_anything_tpu.ops.attention import temporal_flat_attention
    rng = np.random.default_rng(3)
    p, t, h, dh = 3, 8, 4, 16
    c = h * dh
    q = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p, t, c)), jnp.float32)
    v_np = rng.standard_normal((p, t, c)).astype(np.float32)
    v_np[:, :, :dh] = 1e4
    out = np.asarray(temporal_flat_attention(q, k, jnp.asarray(v_np),
                                             num_heads=h, scale=dh ** -0.5))
    assert np.abs(out[:, :, dh:]).max() < 100
