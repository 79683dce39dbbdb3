"""Stage costs of the window forward, measured by in-model ablation.

Isolated conv sub-graphs can hit a pathological XLA compile path on this
backend (>25 min for chains that compile in seconds inside the full
model), so stage timing is done the other way around: time the FULL
forward with one stage stubbed to a cheap shape-preserving op, and read
the stage's cost as the delta vs the unablated forward. Stubs keep a data
dependency on their input so XLA cannot dead-code-eliminate upstream work.

Run: python tools/bench_ablate.py [vits|vitl]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu import config as vcfg
from video_depth_anything_tpu.models import dpt, video_depth
from video_depth_anything_tpu.ops import nn as vnn

ENC = sys.argv[1] if len(sys.argv) > 1 else "vitl"
T = 32
SIZE = 518
CHAIN = 3
ITERS = 5


def timed_full(params, x, cfg):
    @jax.jit
    def fn(p, x):
        def body(i, acc):
            out = video_depth.forward(p, x + (acc * 1e-12).astype(x.dtype),
                                      cfg, use_pallas=True)
            return jnp.sum(out)
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    float(fn(params, x))  # compile + warmup
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(params, x))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3


def main():
    cfg = vcfg.MODEL_CONFIGS[ENC]
    params = video_depth.init_params(0, cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, T, SIZE, SIZE, 3)), jnp.bfloat16)

    real_tm = video_depth.temporal_module
    real_rcu = dpt.residual_conv_unit
    real_out = dpt.output_head
    real_scratch = dpt.scratch_rn
    f = cfg.features

    def run(label):
        t = timed_full(params, x, cfg)
        print(f"  {label:<24s}: {t:8.2f} ms/window", flush=True)
        return t

    print(f"{ENC} {SIZE}^2 x{T} ablation (ms/window, chain={CHAIN}):",
          flush=True)
    t_full = run("full forward")

    video_depth.temporal_module = lambda p, y, b, t, **kw: y
    t_no_tm = run("- temporal modules")
    video_depth.temporal_module = real_tm

    dpt.residual_conv_unit = lambda p, y, *a, **kw: y
    t_no_rcu = run("- refinenet RCUs")
    dpt.residual_conv_unit = real_rcu

    def stub_out(p, path_1, out_hw, *a, **kw):
        m = jnp.mean(path_1).astype(jnp.float32)
        return jnp.broadcast_to(m, (path_1.shape[0], *out_hw, 1))

    dpt.output_head = stub_out
    t_no_out = run("- output head")
    dpt.output_head = real_out

    def stub_scratch(p, feats):
        return [y[..., :f] if y.shape[-1] >= f else
                jnp.pad(y, [(0, 0)] * 3 + [(0, f - y.shape[-1])])
                for y in feats]

    dpt.scratch_rn = stub_scratch
    t_no_scratch = run("- scratch_rn")
    dpt.scratch_rn = real_scratch

    # Resize-interp arithmetic cost: replace every dpt-side bilinear resize
    # (fusion-block 2x upsamples + the head's 296->518) with a nearest-ish
    # repeat+slice that moves the same output bytes, so the delta is the
    # interpolation math (dense-matmul cost) alone, not the HBM writes.
    real_resize = dpt.resize_bilinear_align_corners

    def stub_resize(x, out_hw, **kw):
        h, w = x.shape[-3], x.shape[-2]
        ho, wo = out_hw
        if (h, w) == (ho, wo):
            return x
        rh, rw = -(-ho // h), -(-wo // w)
        y = jnp.repeat(jnp.repeat(x, rh, axis=-3), rw, axis=-2)
        return y[..., :ho, :wo, :]

    dpt.resize_bilinear_align_corners = stub_resize
    t_no_resize = run("- dpt resizes")
    dpt.resize_bilinear_align_corners = real_resize

    print("deltas (stage cost):", flush=True)
    print(f"  temporal modules : {t_full - t_no_tm:8.2f}")
    print(f"  refinenet RCUs   : {t_full - t_no_rcu:8.2f}")
    print(f"  output head      : {t_full - t_no_out:8.2f}")
    print(f"  scratch_rn       : {t_full - t_no_scratch:8.2f}")
    print(f"  dpt resize interp: {t_full - t_no_resize:8.2f}")
    print(f"  per frame (full) : {t_full / T:8.3f} ms")


if __name__ == "__main__":
    main()
