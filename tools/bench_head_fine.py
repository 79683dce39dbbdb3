"""Fine-grained timing of the DPT-temporal head stages on the TPU.

Times each head stage as its own jitted chain (amortizing the tunnel
dispatch latency, cf. bench.py --chain): tap projections + resize layers,
each temporal module, scratch_rn, the refinenet cascade, and the output
head. Inputs per stage are materialized once at the real intermediate
shapes. Run: python tools/bench_head_fine.py [vits|vitl]
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
from video_depth_anything_tpu.models.motion import temporal_module
from video_depth_anything_tpu.ops import nn as vnn
from video_depth_anything_tpu.ops.resize import resize_bilinear_align_corners

ENC = sys.argv[1] if len(sys.argv) > 1 else "vitl"
T = 32
SIZE = 518
CHAIN = 3
ITERS = 5


def timed(g, *args):
    # Scalar readout (float(...)): block_until_ready returns early for large
    # outputs on the tunneled backend, so each chain returns a scalar.
    float(g(*args))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3


def chain_fn(f):
    """jit f(head_params, x0, *rest) repeated CHAIN times with a data
    dependency between runs, returning a scalar readout. The param tree is
    the FIRST jit argument (never a closure constant — vitl-sized inlined
    constants overflow the tunnel's remote-compile request, HTTP 413)."""
    @jax.jit
    def g(hp, *args):
        acc = jnp.float32(0.0)
        x0 = args[0]
        for _ in range(CHAIN):
            out = f(hp, x0, *args[1:])
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            acc = acc + jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.float32))
            x0 = x0 + (acc * 1e-12).astype(x0.dtype)
        return acc
    return g


def main():
    cfg = vcfg.MODEL_CONFIGS[ENC]
    params = video_depth.init_params(0, cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)
    p = jax.device_put(params["head"])
    rng = np.random.default_rng(0)
    ph = pw = SIZE // 14
    d = cfg.vit.embed_dim
    oc = list(cfg.out_channels)
    f = cfg.features

    def rand(*shape):
        return jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)

    grids = [rand(T, ph, pw, d) for _ in range(4)]

    def proj_resize(hp, g0, g1, g2, g3):
        layer_1 = vnn.conv_transpose2d(
            hp["resize_layers"]["0"], vnn.conv2d(hp["projects"]["0"], g0),
            stride=4)
        layer_2 = vnn.conv_transpose2d(
            hp["resize_layers"]["1"], vnn.conv2d(hp["projects"]["1"], g1),
            stride=2)
        layer_3 = vnn.conv2d(hp["projects"]["2"], g2)
        layer_4 = vnn.conv2d(
            hp["resize_layers"]["3"], vnn.conv2d(hp["projects"]["3"], g3),
            stride=2, padding=1)
        return layer_1, layer_2, layer_3, layer_4

    layers = jax.jit(proj_resize)(p, *grids)
    t_proj = timed(chain_fn(proj_resize), p, *grids)

    mkw = dict(num_heads=cfg.num_attention_heads, pe=cfg.pe,
               num_transformer_block=cfg.num_transformer_block,
               num_attention_blocks=cfg.num_attention_blocks)
    h4 = (ph + 1) // 2

    tm_shapes = {
        "0": (T, ph, pw, oc[2]),        # layer_3
        "1": (T, h4, h4, oc[3]),        # layer_4 (stride-2)
        "2": (T, ph, pw, f),            # path_4
        "3": (T, 2 * ph, 2 * pw, f),    # path_3
    }
    t_tm = {}
    for k, shp in tm_shapes.items():
        xin = rand(*shp)
        t_tm[k] = timed(chain_fn(
            lambda hp, x, k=k: temporal_module(hp["motion_modules"][k], x,
                                               1, T, **mkw)), p, xin)

    def scratch(hp, l1, l2, l3, l4):
        return tuple(dpt.scratch_rn(hp, [l1, l2, l3, l4]))

    rns = jax.jit(scratch)(p, *layers)
    t_scratch = timed(chain_fn(scratch), p, *layers)

    l1rn, l2rn, l3rn, l4rn = rns

    def refinenets(hp, l1, l2, l3, l4):
        sc = hp["scratch"]
        path_4 = dpt.feature_fusion_block(sc["refinenet4"], l4,
                                          size=l3.shape[-3:-1],
                                          use_bn=cfg.use_bn)
        path_3 = dpt.feature_fusion_block(sc["refinenet3"], path_4, l3,
                                          size=l2.shape[-3:-1],
                                          use_bn=cfg.use_bn)
        path_2 = dpt.feature_fusion_block(sc["refinenet2"], path_3, l2,
                                          use_bn=cfg.use_bn)
        path_1 = dpt.feature_fusion_block(sc["refinenet1"], path_2, l1,
                                          use_bn=cfg.use_bn)
        return path_1

    # NOTE: refinenet2's real size arg is l1rn's HW; with the standard 4x/2x
    # tap geometry scale_factor-2 (size=None) is identical.
    path_1 = jax.jit(refinenets)(p, l1rn, l2rn, l3rn, l4rn)
    path_1.block_until_ready()
    t_refine = timed(chain_fn(refinenets), p, l1rn, l2rn, l3rn, l4rn)

    def out_head(hp, x):
        return dpt.output_head(hp, x, (14 * ph, 14 * pw))

    t_out = timed(chain_fn(out_head), p, path_1)

    depth = jax.jit(out_head)(p, path_1)
    depth.block_until_ready()

    def final_resize(hp, dd):
        del hp  # no params; chain_fn's signature keeps the tools uniform
        out = resize_bilinear_align_corners(dd.astype(jnp.float32),
                                            (SIZE, SIZE))
        return jnp.maximum(out, 0.0)[..., 0].reshape(1, T, SIZE, SIZE)

    t_final = timed(chain_fn(final_resize), p, depth)

    total = (t_proj + sum(t_tm.values()) + t_scratch + t_refine + t_out
             + t_final)
    print(f"{ENC} {SIZE}^2 x{T} head stages (ms/window, chain={CHAIN}):",
          flush=True)
    print(f"  proj+resize taps : {t_proj:8.2f}")
    for k in tm_shapes:
        print(f"  temporal mod {k}   : {t_tm[k]:8.2f}  {tm_shapes[k]}")
    print(f"  scratch_rn       : {t_scratch:8.2f}")
    print(f"  refinenet x4     : {t_refine:8.2f}")
    print(f"  output head      : {t_out:8.2f}")
    print(f"  final resize     : {t_final:8.2f}")
    print(f"  sum              : {total:8.2f}  ({total / T:.3f} ms/frame)")


if __name__ == "__main__":
    main()
