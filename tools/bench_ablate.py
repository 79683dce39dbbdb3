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

ENC = next((a for a in sys.argv[1:] if not a.startswith("-")), "vitl")
HEAD_MODE = "--head" in sys.argv  # sub-stage ablation of output_head only
TM_MODE = "--temporal" in sys.argv  # sub-stage ablation of temporal modules
ENC_MODE = "--encoder" in sys.argv  # sub-stage ablation of the ViT encoder
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

    if ENC_MODE:
        # Sub-stage ablation of the DINOv2 encoder: stub ONE sub-op across
        # all blocks (in the scanned _block_step body), read its in-graph
        # cost as the delta vs the full forward. Stubs keep 1e-12-scaled
        # data deps so upstream work can't fold away.
        from video_depth_anything_tpu.models import dinov2
        from video_depth_anything_tpu.ops import pallas_attention as pa

        deltas = {}

        real_flash = pa.flash_attention_packed
        pa.flash_attention_packed = (
            lambda q, k, v, **kw: v + (q + k) * jnp.asarray(1e-12, q.dtype))
        deltas["attention math"] = t_full - run("- attn kernel")
        pa.flash_attention_packed = real_flash

        # kernel vs plain-XLA attention (head-split einsums + layout copies)
        real_blockstep = dinov2._block_step

        def xla_attn_step(carry, bp, **kw):
            kw["use_pallas"] = False
            return real_blockstep(carry, bp, **kw)

        dinov2._block_step = xla_attn_step
        deltas["kernel -> xla attn"] = run("- attn=xla einsum") - t_full
        dinov2._block_step = real_blockstep

        real_ffn = dinov2._ffn
        dinov2._ffn = lambda bp, y, ffn_layer: y * jnp.asarray(1e-12, y.dtype)
        deltas["mlp (fc1+gelu+fc2)"] = t_full - run("- mlp")
        dinov2._ffn = real_ffn

        real_ln = vnn.layer_norm
        vnn.layer_norm = lambda p, x, eps=1e-6: x * jnp.asarray(1e-12, x.dtype)
        deltas["layer_norms (all)"] = t_full - run("- layer_norm")
        vnn.layer_norm = real_ln

        # whole transformer stack (keeps patch embed + pos interp)
        real_gil = dinov2.get_intermediate_layers

        # Run zero blocks: embed tokens, then reuse that embedding (scaled,
        # final-norm'd) for every tap — keeps patch embed + pos interp +
        # the downstream head at full cost.
        def stub_gil(params, x, cfg2, taps, use_pallas=None):
            y = dinov2._embed_tokens(params, x, cfg2)
            y = vnn.layer_norm(params["norm"], y, eps=1e-6)
            return [(y[:, 1:, :] * jnp.asarray(1e-12 * (i + 1), y.dtype),
                     y[:, 0, :]) for i in range(len(taps))]

        dinov2.get_intermediate_layers = stub_gil
        deltas["all ViT blocks"] = t_full - run("- whole ViT stack")
        dinov2.get_intermediate_layers = real_gil

        print("encoder sub-stage deltas (ms/window):", flush=True)
        for k, v in deltas.items():
            print(f"  {k:<20s}: {v:8.2f}")
        n_blk = cfg.vit.depth
        gemm = (deltas["all ViT blocks"] - deltas["attention math"]
                - deltas["mlp (fc1+gelu+fc2)"] - deltas["layer_norms (all)"])
        print(f"  residual qkv/proj GEMMs + adds: {gemm:8.2f} "
              f"({n_blk} blocks)")
        return

    if TM_MODE:
        # Sub-stage ablation of the temporal modules: stub one sub-op
        # across all 4 modules, read its cost as the delta. Stubs keep a
        # 1e-12-scaled data dependency so XLA can't fold them away.
        from video_depth_anything_tpu.models import motion
        from video_depth_anything_tpu.ops import (
            pallas_temporal_attention as pta)

        deltas = {}
        real_attn = motion._temporal_attention
        motion._temporal_attention = \
            lambda p, x, *a, **kw: x * jnp.asarray(1e-12, x.dtype)
        deltas["attention (all)"] = t_full - run("- tm attention")
        motion._temporal_attention = real_attn

        # motion._temporal_attention re-imports temporal_flat_attention
        # from ops.attention at call time, so patching the module attribute
        # hits the real in-model dispatch (the einsum form — the Pallas
        # kernel has no in-model call sites since the einsums won the A/B).
        from video_depth_anything_tpu.ops import attention as attn_mod

        real_flat = attn_mod.temporal_flat_attention
        attn_mod.temporal_flat_attention = \
            lambda q, k, v, *, num_heads, scale: v + q * jnp.asarray(
                1e-12, q.dtype)
        deltas["attn math only"] = t_full - run("- tm attn math")
        attn_mod.temporal_flat_attention = real_flat

        attn_mod.temporal_flat_attention = \
            lambda q, k, v, *, num_heads, scale: pta.temporal_flash_attention(
                q, k, v, num_heads=num_heads, scale=scale)
        deltas["flat -> pallas kernel"] = t_full - run("- tm flat=pallas")
        attn_mod.temporal_flat_attention = real_flat

        real_ff = motion._geglu_ff
        motion._geglu_ff = \
            lambda p, x, **kw: x * jnp.asarray(1e-12, x.dtype)
        deltas["geglu ff"] = t_full - run("- tm ff")
        motion._geglu_ff = real_ff

        real_gn = vnn.group_norm
        vnn.group_norm = lambda p, x, **kw: x * jnp.asarray(1e-12, x.dtype)
        deltas["group_norm"] = t_full - run("- tm group_norm")
        vnn.group_norm = real_gn

        print("temporal sub-stage deltas (ms/window):", flush=True)
        for k, v in deltas.items():
            print(f"  {k:<18s}: {v:8.2f}")
        return

    if HEAD_MODE:
        # Sub-stage ablation of output_head (models/dpt.py:86-126): each
        # variant stubs ONE sub-op with a shape-preserving slice/copy that
        # keeps the data dependency. Deltas = that sub-op's cost.
        from video_depth_anything_tpu.ops.resize import (
            resize_bilinear_align_corners as real_rs)

        def head_variant(skip):
            def f(p, path_1, out_hw, fp32_island=True, mixed_island=True):
                w1 = p["scratch"]["output_conv1"]
                if skip == "conv1":
                    out = path_1[..., :w1["w"].shape[-1]]
                else:
                    out = vnn.conv2d(w1, path_1, stride=1, padding=1)
                if skip == "resize":
                    h, w_ = out.shape[-3], out.shape[-2]
                    rh, rw = -(-out_hw[0] // h), -(-out_hw[1] // w_)
                    out = jnp.repeat(jnp.repeat(out, rh, -3), rw, -2)
                    out = out[..., :out_hw[0], :out_hw[1], :]
                else:
                    out = real_rs(out, out_hw)
                w2 = p["scratch"]["output_conv2"]["0"]
                if skip == "conv2a":
                    out = jnp.maximum(out[..., :w2["w"].shape[-1]], 0)
                else:
                    out = jax.lax.conv_general_dilated(
                        out, w2["w"].astype(out.dtype), (1, 1),
                        ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    out = jnp.maximum(out + w2["b"].astype(jnp.float32),
                                      0).astype(jnp.bfloat16)
                w3 = p["scratch"]["output_conv2"]["2"]
                if skip == "conv2b":
                    out = out[..., :1].astype(jnp.float32)
                else:
                    out = jax.lax.conv_general_dilated(
                        out, w3["w"].astype(out.dtype), (1, 1),
                        ((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    out = out + w3["b"].astype(jnp.float32)
                return jnp.maximum(out, 0)
            return f

        deltas = {}
        for skip in ("conv1", "resize", "conv2a", "conv2b"):
            dpt.output_head = head_variant(skip)
            deltas[skip] = t_full - run(f"- head {skip}")
        dpt.output_head = real_out
        print("head sub-stage deltas (ms/window):", flush=True)
        for k, v in deltas.items():
            print(f"  {k:<8s}: {v:8.2f}")
        return

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
