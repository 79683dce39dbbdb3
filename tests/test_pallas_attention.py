"""Pallas flash-attention kernel vs the XLA reference path (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.ops.attention import _xla_mha
from video_depth_anything_tpu.ops.pallas_attention import flash_attention


@pytest.mark.parametrize("mxu_denom", [True, False])
@pytest.mark.parametrize("b,s,h,d", [(2, 1370, 6, 64), (1, 257, 4, 64), (2, 128, 2, 32)])
def test_flash_attention_matches_xla(b, s, h, d, mxu_denom):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    scale = d ** -0.5
    ref = _xla_mha(q, k, v, scale)
    got = flash_attention(q, k, v, scale=scale, interpret=True,
                          mxu_denom=mxu_denom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mxu_denom", [True, False])
@pytest.mark.parametrize("b,s,h,d", [(2, 300, 6, 64), (1, 130, 4, 64)])
def test_flash_attention_packed_matches_xla(b, s, h, d, mxu_denom):
    from video_depth_anything_tpu.ops.pallas_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(3)
    c = h * d
    q = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    scale = d ** -0.5
    qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = _xla_mha(qh, kh, vh, scale).transpose(0, 2, 1, 3).reshape(b, s, c)
    got = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                 interpret=True, mxu_denom=mxu_denom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # base-2 softmax variant is the same function (log2e folded into the
    # q pre-scale); fp32 rounding of the rescale is the only difference
    got2 = flash_attention_packed(q, k, v, num_heads=h, scale=scale,
                                  interpret=True, mxu_denom=mxu_denom,
                                  exp2=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_flash_attention_long_sequence_adaptive_block():
    """High-res regime (S ~ 3k tokens): the q block shrinks to fit VMEM."""
    from video_depth_anything_tpu.ops.pallas_attention import (
        _fit_block_q, flash_attention_packed,
    )

    # Equal-split geometry: q_pad == s_pad (no dead rows), largest block
    # whose fp32 score tile fits the VMEM budget.
    assert _fit_block_q(4096, 1408) == 1408   # 518px: single step
    assert _fit_block_q(4096, 8448) == 192    # 1280px: 44 equal steps
    assert _fit_block_q(4096, 2176) == 544
    assert _fit_block_q(4096, 1408, itemsize=4) == 704  # fp32: halved budget
    assert _fit_block_q(512, 1408) == 352     # caller cap respected
    rng = np.random.default_rng(4)
    b, s, h, d = 1, 2050, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    ref = _xla_mha(qh, kh, vh, 0.125).transpose(0, 2, 1, 3).reshape(b, s, h * d)
    got = flash_attention_packed(q, k, v, num_heads=h, scale=0.125,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s", [300, 130])
def test_flash_attention_packed_qk8_matches_oracle(s):
    """int8-QK kernel vs fp32 attention on the dequantized integers
    (exact same math the kernel's int32 path must reproduce)."""
    from video_depth_anything_tpu.ops.pallas_attention import (
        flash_attention_packed_qk8,
    )

    rng = np.random.default_rng(7)
    b, h, d = 2, 4, 64
    c = h * d
    q8 = jnp.asarray(rng.integers(-127, 128, (b, s, c)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (b, s, c)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    sq_eff = 0.013 * d ** -0.5   # amax_q/127 * attention scale
    sk = 0.021
    scales = jnp.asarray([sq_eff, sk], jnp.float32)

    qf = (np.asarray(q8, np.float32) * sq_eff).reshape(b, s, h, d)
    kf = (np.asarray(k8, np.float32) * sk).reshape(b, s, h, d)
    vf = np.asarray(v).reshape(b, s, h, d)
    ref = _xla_mha(jnp.asarray(qf.transpose(0, 2, 1, 3)),
                   jnp.asarray(kf.transpose(0, 2, 1, 3)),
                   jnp.asarray(vf.transpose(0, 2, 1, 3)), 1.0)
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(b, s, c)
    got = flash_attention_packed_qk8(q8, k8, v, scales, num_heads=h,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_flash_attention_packed_qk8_fallback_geometry():
    """Odd head count routes through the dequantized packed fallback."""
    from video_depth_anything_tpu.ops.pallas_attention import (
        flash_attention_packed_qk8,
    )

    rng = np.random.default_rng(8)
    b, s, h, d = 1, 140, 3, 64
    c = h * d
    q8 = jnp.asarray(rng.integers(-127, 128, (b, s, c)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (b, s, c)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    scales = jnp.asarray([0.01, 0.02], jnp.float32)
    qf = (np.asarray(q8, np.float32) * 0.01).reshape(b, s, h, d)
    kf = (np.asarray(k8, np.float32) * 0.02).reshape(b, s, h, d)
    vf = np.asarray(v).reshape(b, s, h, d)
    ref = _xla_mha(jnp.asarray(qf.transpose(0, 2, 1, 3)),
                   jnp.asarray(kf.transpose(0, 2, 1, 3)),
                   jnp.asarray(vf.transpose(0, 2, 1, 3)), 1.0)
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(b, s, c)
    got = flash_attention_packed_qk8(q8, k8, v, scales, num_heads=h,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mxu_denom", [True, False])
def test_flash_attention_padding_mask(mxu_denom):
    """Padded key positions must not leak into the softmax (with mxu_denom,
    the pad mask lives in the denominator ones-column, not the e tile)."""
    rng = np.random.default_rng(1)
    s = 130  # pads to 256
    q = jnp.asarray(rng.standard_normal((1, 2, s, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, s, 64), dtype=np.float32))
    v = jnp.asarray(100.0 * rng.standard_normal((1, 2, s, 64), dtype=np.float32))
    ref = _xla_mha(q, k, v, 0.125)
    got = flash_attention(q, k, v, scale=0.125, interpret=True,
                          mxu_denom=mxu_denom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3)
