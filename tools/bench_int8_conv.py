"""Does int8 conv hit the doubled MXU rate on v5e via XLA?

Times a 3x3 conv at the DPT refinenet shape (32x148x148x256 -> 256) in
bf16 vs int8(w8a8, int32 accum), chain-amortized.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 32, 148, 148, 256
K = 3
CHAIN = 8
rng = np.random.default_rng(0)

x_f = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
w_f = jnp.asarray(rng.standard_normal((K, K, C, C)) * 0.05, jnp.bfloat16)
x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
w_i = jnp.asarray(rng.integers(-127, 128, (K, K, C, C)), jnp.int8)

dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))


def timed(fn, *args, iters=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


@jax.jit
def conv_bf16(x, w):
    def body(i, acc):
        y = jax.lax.conv_general_dilated(
            x + (acc * 1e-12).astype(x.dtype), w, (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.sum(y.astype(jnp.float32))
    return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))


@jax.jit
def conv_int8(x, w):
    def body(i, acc):
        xx = (x.astype(jnp.int32) + (acc % 2).astype(jnp.int32)).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xx, w, (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        return acc + jnp.sum(y, dtype=jnp.int32)
    return jax.lax.fori_loop(0, CHAIN, body, jnp.int32(0)).astype(jnp.float32)


@jax.jit
def conv_int8_gemm(x, w):
    # 3x3 conv as 9 shifted int8 GEMMs accumulated in int32 (k-stacking).
    def body(i, acc):
        xx = (x.astype(jnp.int32) + (acc % 2).astype(jnp.int32)).astype(jnp.int8)
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros((B, H, W, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                y = y + jax.lax.dot_general(
                    jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C)),
                    w[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        return acc + jnp.sum(y, dtype=jnp.int32)
    return jax.lax.fori_loop(0, CHAIN, body, jnp.int32(0)).astype(jnp.float32)


flops = 2.0 * B * H * W * C * C * K * K
for name, fn, a, b in [("bf16 conv", conv_bf16, x_f, w_f),
                       ("int8 conv", conv_int8, x_i, w_i),
                       ("int8 9-gemm", conv_int8_gemm, x_i, w_i)]:
    try:
        t = timed(fn, a, b)
        print(f"{name:12s}: {t*1e3:8.3f} ms  {flops/t/1e12:7.1f} TF/s")
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:200]}")
