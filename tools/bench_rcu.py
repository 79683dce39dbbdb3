"""TPU microbench: fused RCU Pallas kernel vs the XLA conv chain.

Shapes are the vitl-518^2 DPT head RefineNet feature maps (32-frame
window). Prints per-shape ms and delivered TF/s for both paths plus a
max-abs parity check. Run on the TPU:  python tools/bench_rcu.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.models.dpt import residual_conv_unit
from video_depth_anything_tpu.ops.pallas_conv import fused_rcu

SHAPES = [  # (N, H, W, C): refinenet1/2/3/4 RCU inputs, vitl 518^2
    (32, 148, 148, 256),
    (32, 74, 74, 256),
    (32, 37, 37, 256),
    (32, 19, 19, 256),
]
CHAIN = 4  # in-graph repeats to amortize the ~26 ms tunnel dispatch


def timed(fn, x, iters=6):
    def chained(x):
        for _ in range(CHAIN):
            x = fn(x)
        return x
    g = jax.jit(chained)
    g(x).block_until_ready()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        g(x).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    rng = np.random.default_rng(0)
    for shape in SHAPES:
        n, h, w, c = shape
        p = {k: {"w": jnp.asarray(rng.normal(0, 0.04, (3, 3, c, c)),
                                  jnp.float32),
                 "b": jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)}
             for k in ("conv1", "conv2")}
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)
        ref = jax.jit(lambda x: residual_conv_unit(p, x, use_pallas=False))
        ker = jax.jit(lambda x: fused_rcu(p, x))
        err = float(jnp.max(jnp.abs(ref(x).astype(jnp.float32)
                                    - ker(x).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref(x).astype(jnp.float32))))
        t_ref = timed(ref, x)
        t_ker = timed(ker, x)
        fl = 4 * n * h * w * 9 * c * c
        print(f"{shape}: xla {t_ref*1e3:7.3f} ms ({fl/t_ref/1e12:6.1f} TF/s)"
              f"  pallas {t_ker*1e3:7.3f} ms ({fl/t_ker/1e12:6.1f} TF/s)"
              f"  speedup {t_ref/t_ker:5.2f}x  maxerr {err:.4f}"
              f" (rel {err/scale:.2e})", flush=True)


if __name__ == "__main__":
    main()
