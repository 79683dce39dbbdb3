"""Segment-level timing of the vitl window forward on the TPU.

Times jitted sub-graphs (encoder taps / head / temporal modules / full
forward) with an in-graph chain to amortize the ~26 ms tunnel dispatch,
giving the ms-per-window budget per stage. Params are passed as jit
arguments (NOT closed over): inlining 381M vitl params as constants blows
the tunnel's remote-compile request size limit (HTTP 413).
Run: python tools/bench_segments.py [vits|vitl]
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
    # Scalar readout: block_until_ready returns early for large outputs on
    # the tunneled backend; each benched fn returns an in-graph scalar sum.
    float(g(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(g(*args))
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

    def enc_feats(p, flat):
        return dinov2.get_intermediate_layers(
            p["pretrained"], flat, cfg.vit, cfg.intermediate_layer_idx)

    @jax.jit
    def enc(p, x):
        flat = x.reshape(*flat_shape)
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            feats = enc_feats(p, flat)
            acc = acc + jnp.sum(feats[-1][0][0, 0].astype(jnp.float32))
            flat = flat + (acc * 1e-12).astype(flat.dtype)
        return acc

    feats0 = jax.jit(enc_feats)(params, x.reshape(*flat_shape))
    feats0 = jax.tree.map(lambda a: a, feats0)

    @jax.jit
    def head(p, feats):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = _head_forward(p["head"], feats, ph, pw, 1, T, cfg)
            acc = acc + jnp.sum(out[0, 0, 0])
            feats = [(f + (acc * 1e-12).astype(f.dtype), c) for f, c in feats]
        return acc

    @jax.jit
    def full(p, x):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            out = video_depth.forward(p, x, cfg)
            acc = acc + jnp.sum(out[0, 0, 0])
            x = x + (acc * 1e-12).astype(x.dtype)
        return acc

    t_enc = timed(enc, params, x)
    t_head = timed(head, params, feats0)
    t_full = timed(full, params, x)
    print(f"{ENC} {SIZE}^2 x{T} (ms/window, chain={CHAIN}):", flush=True)
    print(f"  encoder taps : {t_enc*1e3:8.2f}")
    print(f"  head (DPT+T) : {t_head*1e3:8.2f}")
    print(f"  full forward : {t_full*1e3:8.2f}")
    print(f"  resize+other : {(t_full-t_enc-t_head)*1e3:8.2f}")
    print(f"  per frame    : {t_full*1e3/T:8.3f} ms")


if __name__ == "__main__":
    main()
