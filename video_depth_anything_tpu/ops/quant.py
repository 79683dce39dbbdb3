"""int8 encoder quantization (optional --int8 mode).

w8a8 symmetric quantization of the six hot matmuls per ViT block
(attn q/k/v/proj, mlp fc1/fc2): per-out-channel int8 weights, *static*
per-tensor activation scales from a one-window calibration pass
(models/dinov2.py::calibrate_encoder_stats). Everything else (patch embed,
norms, LayerScale, attention itself, the DPT head) stays bf16/fp32.

Why static scales: measured on v5e at the vitl encoder shapes
([43872,1024]x[1024,4096] chains), int8 MACs run the matmul chain 1.46x
faster than bf16 (219 vs 150 TF/s delivered) with static scales, but only
1.20x with dynamic per-tensor max — the on-the-fly max/rescale sweeps cost
almost the whole win. Saturating at the calibrated absmax (jnp.clip below)
is the standard static-quant contract.

Relation to the reference: its fast path is fp16 autocast
(/root/reference/video_depth_anything/video_depth.py:203-205); int8 is the
TPU-native step further (v5e has 2x int8 MACs), gated behind a flag and
accuracy-budgeted end to end (tests/test_quant.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Activation-quantization sites per block, in forward order. "qkv" is one
# shared site: q, k and v consume the same LN1 output, quantized once.
# "q_out"/"k_out" are the q/k projection *outputs*, quantized so the flash
# kernel's QK matmul runs int8 on the MXU (flash_attention_packed_qk8).
ACT_SITES = ("qkv", "proj", "fc1", "fc2", "q_out", "k_out")


def amax(x):
    """Calibration primitive: fp32 absmax of a tensor (static act scales)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def quantize_weight(w):
    """w [..., K, N] float -> (w_i8 [..., K, N] int8, ws [..., N] fp32).

    Symmetric per-out-channel: ws = absmax over K / 127.
    """
    w32 = jnp.asarray(w, jnp.float32)
    ws = jnp.max(jnp.abs(w32), axis=-2) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    w_i8 = jnp.round(w32 / ws[..., None, :]).astype(jnp.int8)
    return w_i8, ws


def quant_act(x, amax):
    """Quantize activations with a static absmax (values beyond it saturate)."""
    inv = 127.0 / jnp.maximum(amax.astype(jnp.float32), 1e-12)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                    -127, 127).astype(jnp.int8)


def qlinear(p, x_i8, amax, out_dtype):
    """int8 x_i8 [..., K] @ p.w_i8 [K, N] -> dequantized [..., N] out_dtype.

    int32 MXU accumulation; the dequant multiply (per-column weight scale x
    per-tensor act scale) and bias add fuse into the matmul epilogue.
    """
    y = jax.lax.dot_general(x_i8, p["w_i8"],
                            (((x_i8.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    scale = p["ws"].astype(jnp.float32) * (amax.astype(jnp.float32) / 127.0)
    y = (y.astype(jnp.float32) * scale).astype(out_dtype)
    if "b" in p:
        y = y + p["b"].astype(out_dtype)
    return y


def _quantize_site(site):
    w_i8, ws = quantize_weight(site["w"])
    out = {"w_i8": w_i8, "ws": ws}
    if "b" in site:
        out["b"] = site["b"]
    return out


def linear_maybe_q(p, x, amax=None, x_i8=None):
    """vnn.linear that transparently takes the int8 path when `p` carries
    int8 leaves. amax: the site's static activation absmax; x_i8: an
    already-quantized input shared between sites (e.g. one LN output
    feeding q, k and v — quantize once)."""
    if "w_i8" not in p:
        from . import nn as vnn
        return vnn.linear(p, x)
    if x_i8 is None:
        x_i8 = quant_act(x, amax)
    return qlinear(p, x_i8, amax, x.dtype)


def quantize_motion_module(mp, stats):
    """Quantize one TemporalModule's matmuls (models/motion.py) — proj_in,
    per-attention-block to_q/k/v/to_out, GEGLU ff, proj_out — using the
    stats tree temporal_module(collect_stats=True) returned. Activation
    scales land in "qs" dicts at the level the forward reads them."""
    tt = mp["temporal_transformer"]

    def s(v):
        return jnp.asarray(v, jnp.float32)

    new_blocks = {}
    for i, bp in tt["transformer_blocks"].items():
        bst = stats["blocks"][i]
        new_attn = {}
        for j, ap in bp["attention_blocks"].items():
            ast = bst["attn"][j]
            new_attn[j] = {
                **ap,
                "to_q": _quantize_site(ap["to_q"]),
                "to_k": _quantize_site(ap["to_k"]),
                "to_v": _quantize_site(ap["to_v"]),
                "to_out": {"0": _quantize_site(ap["to_out"]["0"])},
                "qs": {"qkv": s(ast["qkv"]), "out": s(ast["out"])},
            }
        new_ff = {
            "net": {"0": {"proj": _quantize_site(bp["ff"]["net"]["0"]["proj"])},
                    "2": _quantize_site(bp["ff"]["net"]["2"])},
            "qs": {"ff_proj": s(bst["ff_proj"]), "ff_g": s(bst["ff_g"])},
        }
        new_blocks[i] = {**bp, "attention_blocks": new_attn, "ff": new_ff}
    new_tt = {
        **tt,
        "proj_in": _quantize_site(tt["proj_in"]),
        "proj_out": _quantize_site(tt["proj_out"]),
        "transformer_blocks": new_blocks,
        "qs": {"proj_in": s(stats["proj_in"]),
               "proj_out": s(stats["proj_out"])},
    }
    return {**mp, "temporal_transformer": new_tt}


def quantize_encoder(pretrained, act_stats, depth: int):
    """Quantize the stacked encoder blocks of a `pretrained` param tree.

    act_stats: {"qkv"|"proj"|"fc1"|"fc2": [L'] fp32 absmax} from
    calibrate_encoder_stats (L' = blocks actually run, i.e. last tap + 1).
    Blocks past L' never execute at inference; their scales pad with 1.0 so
    the stacked leaves keep the scan-sliceable [depth, ...] shape.

    Returns a new tree; models/dinov2.py::_block_step dispatches on the
    presence of the "qs" leaf. Both FFN layouts quantize: MLP fc1/fc2 and
    the fused-SwiGLU w12/w3 (vitg), whose act scales ride the same
    "fc1"/"fc2" stat slots.
    """
    blocks = pretrained["blocks"]
    new_attn = {k: (_quantize_site(v) if k in ("q", "k", "v", "proj") else v)
                for k, v in blocks["attn"].items()}
    new_mlp = blocks["mlp"]
    if "fc1" in blocks["mlp"]:
        new_mlp = {k: (_quantize_site(v) if k in ("fc1", "fc2") else v)
                   for k, v in blocks["mlp"].items()}
    elif "w12" in blocks["mlp"]:
        new_mlp = {k: (_quantize_site(v) if k in ("w12", "w3") else v)
                   for k, v in blocks["mlp"].items()}
    qs = {}
    for k in ACT_SITES:
        if k not in act_stats:
            continue  # stats from an older calibration tree
        v = jnp.asarray(act_stats[k], jnp.float32)
        if v.shape[0] < depth:
            v = jnp.concatenate([v, jnp.ones((depth - v.shape[0],), jnp.float32)])
        qs[k] = v
    new_blocks = {**blocks, "attn": new_attn, "mlp": new_mlp, "qs": qs}
    return {**pretrained, "blocks": new_blocks}
