"""Core NN primitives: functional, NHWC, bf16-friendly with fp32 islands.

Parameter layout conventions (used by the torch checkpoint converter,
utils/torch_convert.py):
  linear: {"w": [in, out], "b": [out]}              (torch weight.T)
  conv  : {"w": [Kh, Kw, Cin, Cout], "b": [Cout]}   (torch OIHW -> HWIO)
  norm  : {"scale": [C], "bias": [C]}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p, x, eps: float = 1e-6):
    """LayerNorm over the last axis; statistics in fp32 (autocast behavior).

    In fp32 this is the exact reference computation. In bf16 the row
    statistics still accumulate in fp32 but the normalization runs in bf16 —
    the output is bf16 anyway, and the half-width elementwise sweeps matter
    on the VPU-bound path between matmuls.
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * p["scale"] + p["bias"]
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    # E[x^2] - E[x]^2 in fp32: stable enough here because LN inputs are
    # pre-norm residual streams with O(1..30) magnitudes.
    sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    var = sq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)   # [..., 1] row broadcast
    y = (x - mean.astype(x.dtype)) * inv
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over channels of x[..., C] with fp32 statistics.

    Reference: torch.nn.GroupNorm(32, C, eps=1e-6) applied to NCHW feature
    maps (motion_module.py:84,110); here x is channel-last and the group
    statistics are taken over (spatial..., channels-in-group) per sample.

    TPU note: grouping via reshape to [..., G, C//G] puts 8 lanes in the
    trailing dim — a pathological layout. Instead, per-channel sums reduce
    over the well-laid spatial axis and a static [C, G] indicator matmul
    folds channels into groups; two passes (mean, then centered variance)
    avoid E[x^2]-E[x]^2 cancellation.
    """
    import numpy as np

    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    b = x.shape[0]
    flat = x.reshape(b, -1, c)
    n = flat.shape[1] * (c // num_groups)
    ind = np.kron(np.eye(num_groups, dtype=np.float32),
                  np.ones((c // num_groups, 1), np.float32))  # [C, G]
    indj = jnp.asarray(ind)

    s1 = jnp.sum(flat, axis=1, dtype=jnp.float32)            # [B, C]
    gmean = (s1 @ indj) / n                                    # [B, G]
    mean_c = gmean @ indj.T                                    # [B, C]
    d = flat.astype(jnp.float32) - mean_c[:, None, :]
    s2 = jnp.sum(jnp.square(d), axis=1)                        # [B, C]
    gvar = (s2 @ indj) / n                                     # [B, G]
    inv_c = (jax.lax.rsqrt(gvar + eps) @ indj.T)               # [B, C]
    y = d * inv_c[:, None, :]
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype).reshape(x.shape)


def gelu(x):
    """GELU matching torch.nn.GELU (exact erf) in full precision.

    In bf16 the tanh approximation is used: its error (~1e-3 relative) is
    below bf16 rounding, and erf is markedly more expensive on the VPU —
    the same kind of policy torch autocast applies to transcendentals.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def conv2d(p, x, stride: int = 1, padding: int = 0):
    """NHWC conv with HWIO weights (torch Conv2d semantics)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose2d(p, x, stride: int):
    """NHWC transposed conv matching torch ConvTranspose2d(k=s, stride=s).

    The DPT resize layers only use kernel_size == stride with no padding
    (dpt.py:70-82), for which the transpose is an exact block upsample:
    every output pixel receives exactly one (input pixel, kernel tap)
    contribution. Implemented as matmul + reshape (MXU, no scatter).
    """
    kh, kw, cout, cin = p["w"].shape  # converter stores torch IOHW -> HWOI
    assert (kh, kw) == (stride, stride), "only k==s supported (DPT resize layers)"
    b, h, w, _ = x.shape
    # [B,H,W,Cin] @ [Cin, kh*kw*Cout]
    wmat = p["w"].astype(x.dtype).transpose(3, 0, 1, 2).reshape(cin, kh * kw * cout)
    y = jnp.dot(x, wmat, preferred_element_type=x.dtype)  # [B,H,W,kh*kw*Cout]
    y = y.reshape(b, h, w, kh, kw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * kh, w * kw, cout)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y
