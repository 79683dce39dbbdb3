"""Segment-level timing of the vitl window forward on the TPU.

Times jitted sub-graphs (encoder taps / head / temporal modules / full
forward) with an in-graph chain to amortize the ~26 ms tunnel dispatch,
giving the ms-per-window budget per stage. Run: python tools/bench_segments.py [vits|vitl]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu import config as vcfg
from video_depth_anything_tpu.models import dinov2, video_depth
from video_depth_anything_tpu.models.video_depth import _head_forward

ENC = sys.argv[1] if len(sys.argv) > 1 else "vitl"
T = 32
SIZE = 518
CHAIN = 3


def timed(g, *args, iters=5):
    jax.tree.map(lambda a: a.block_until_ready(), g(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = g(*args)
        jax.tree.map(lambda a: a.block_until_ready(), r)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def main():
    cfg = vcfg.MODEL_CONFIGS[ENC]
    params = video_depth.init_params(0, cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, T, SIZE, SIZE, 3)), jnp.bfloat16)
    ph = pw = SIZE // 14
    flat_shape = (T, SIZE, SIZE, 3)

    @jax.jit
    def enc(x):
        flat = x.reshape(*flat_shape)
        out = None
        for _ in range(CHAIN):
            feats = dinov2.get_intermediate_layers(
                params["pretrained"], flat, cfg.vit,
                cfg.intermediate_layer_idx)
            out = feats
            flat = flat + out[0][0][0, 0, 0].astype(flat.dtype) * 0
        return out

    feats0 = jax.jit(lambda x: enc(x))(x)
    feats0 = jax.tree.map(lambda a: a, feats0)

    @jax.jit
    def head(feats):
        out = None
        for _ in range(CHAIN):
            out = _head_forward(params["head"], feats, ph, pw, 1, T, cfg)
            feats = [(f + out[0, 0, 0].astype(f.dtype) * 0, c)
                     for f, c in feats]
        return out

    @jax.jit
    def full(x):
        out = None
        for _ in range(CHAIN):
            out = video_depth.forward(params, x, cfg)
            x = x + out[0, 0, 0, 0].astype(x.dtype) * 0
        return out

    t_enc = timed(enc, x)
    t_head = timed(head, feats0)
    t_full = timed(full, x)
    print(f"{ENC} {SIZE}^2 x{T} (ms/window, chain={CHAIN}):", flush=True)
    print(f"  encoder taps : {t_enc*1e3:8.2f}")
    print(f"  head (DPT+T) : {t_head*1e3:8.2f}")
    print(f"  full forward : {t_full*1e3:8.2f}")
    print(f"  resize+other : {(t_full-t_enc-t_head)*1e3:8.2f}")
    print(f"  per frame    : {t_full*1e3/T:8.3f} ms")


if __name__ == "__main__":
    main()
