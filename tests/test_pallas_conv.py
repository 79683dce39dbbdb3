"""Fused RCU Pallas kernel vs the XLA conv chain (interpret mode).

The kernel fuses relu-conv3x3-relu-conv3x3-skip (reference
util/blocks.py:37-91) into one implicit-GEMM pass; these tests pin it to
the XLA path over the DPT head's real aspect ratios, multi-tile splits,
and both supported dtypes, plus the fallback gating.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.models.dpt import residual_conv_unit
from video_depth_anything_tpu.ops.pallas_conv import fused_rcu, rcu_supported


def _params(c, seed=0):
    rng = np.random.default_rng(seed)
    return {k: {"w": jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)),
                                 jnp.float32),
                "b": jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)}
            for k in ("conv1", "conv2")}


@pytest.mark.parametrize("n,h,w,c", [
    (2, 9, 16, 128),    # multi-row tile, W % 8 == 0
    (1, 19, 19, 256),   # refinenet4 scale, single tile, unaligned M
    (1, 21, 37, 256),   # H != W, odd W
    (2, 37, 37, 256),   # refinenet3 scale (bumped to an aligned 40-row tile)
])
def test_fused_rcu_matches_xla(n, h, w, c):
    rng = np.random.default_rng(1)
    p = _params(c)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)), jnp.float32)
    ref = residual_conv_unit(p, x, use_pallas=False)
    got = fused_rcu(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_rcu_bf16():
    """bf16 storage, fp32 MXU accumulation: compare against the fp32 XLA
    chain within a bf16 rounding budget."""
    rng = np.random.default_rng(2)
    c = 128
    p = _params(c, seed=3)
    xf = rng.normal(0, 1, (1, 12, 16, c)).astype(np.float32)
    ref = residual_conv_unit(p, jnp.asarray(xf), use_pallas=False)
    got = fused_rcu(p, jnp.asarray(xf, jnp.bfloat16), interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    assert err < 0.03 * scale, (err, scale)


def test_fused_rcu_zero_input_is_pure_bias_path():
    """Image-boundary halo: conv2 must see *zero-padded* intermediates, not
    conv1(0)=bias rows (the bug class the row-validity mask guards)."""
    c = 128
    p = _params(c, seed=4)
    x = jnp.zeros((1, 8, 16, c), jnp.float32)
    ref = residual_conv_unit(p, x, use_pallas=False)
    got = fused_rcu(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rcu_supported_gating():
    x_ok = jnp.zeros((1, 19, 19, 256), jnp.bfloat16)
    assert rcu_supported(x_ok, use_bn=False)
    assert not rcu_supported(x_ok, use_bn=True)           # BN falls back
    assert not rcu_supported(jnp.zeros((1, 19, 19, 64)), False)   # vits C=64
    assert not rcu_supported(jnp.zeros((1, 2, 19, 256)), False)   # degenerate H


def test_residual_conv_unit_routes_to_kernel_off_tpu():
    """On CPU the default (use_pallas=None) must stay on the XLA path, and
    use_pallas=True must agree with it through the interpret fallback."""
    p = _params(128, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (1, 9, 16, 128)), jnp.float32)
    default = residual_conv_unit(p, x)               # CPU -> XLA
    explicit = fused_rcu(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(default), np.asarray(explicit),
                               rtol=1e-4, atol=1e-4)
