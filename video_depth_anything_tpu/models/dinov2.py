"""DINOv2 ViT encoder — functional JAX, scan-stacked blocks, NHWC.

Behavioral parity with the reference DinoVisionTransformer
(/root/reference/video_depth_anything/dinov2.py:44-415) configured as in the
DINOv2 factory (dinov2.py:398-415): patch 14, img 518, LayerScale
init_values=1.0, exact-GELU MLP FFN, no registers, interpolate_offset=0.1,
pre-norm blocks, LayerNorm eps 1e-6.

TPU-first design choices (not a port):
- all transformer blocks share one compiled body via lax.scan over stacked
  block parameters; the encoder scans *segments* between feature-tap indices
  (get_intermediate_layers semantics, dinov2.py:297-321) so taps cost no
  extra memory;
- q/k/v are separate projections so attention consumes [B,S,H,D] with zero
  layout copies (see ops/pallas_attention.py);
- positional-embedding bicubic interpolation (dinov2.py:179-210, including
  the +0.1 scale-factor quirk) is folded into static per-shape weight
  matrices applied as fp32 matmuls at trace time.

Param tree (under "pretrained", 1:1 with the torch checkpoint via
utils/torch_convert.py):
  cls_token [1,1,D]; pos_embed [1,1+N,D]; mask_token [1,D]
  patch_embed.proj {w: [14,14,3,D], b}
  blocks: stacked leaves [L, ...] of
    {norm1, attn: {q,k,v,proj}, ls1: {gamma}, norm2, mlp: {fc1,fc2}, ls2}
  norm {scale, bias}
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig
from ..ops import attention as attn_ops
from ..ops import nn as vnn
from ..ops import quant as quant_ops
from ..ops.resize import cubic_resize_matrix


def interpolate_pos_encoding(pos_embed: jax.Array, ph: int, pw: int,
                             cfg: ViTConfig) -> jax.Array:
    """Resample pos_embed [1, 1+N, D] to a (ph, pw) patch grid.

    Mirrors dinov2.py:179-210: bicubic with scale_factor
    (grid + interpolate_offset)/sqrt(N) per axis, computed in fp32.
    """
    n = pos_embed.shape[1] - 1
    if ph * pw == n and ph == pw:
        return pos_embed
    g = int(math.sqrt(n))
    assert g * g == n, f"pos_embed patches {n} not square"
    dim = pos_embed.shape[-1]
    cls_pos = pos_embed[:, :1].astype(jnp.float32)
    patch_pos = pos_embed[:, 1:].astype(jnp.float32).reshape(g, g, dim)
    sh = (ph + cfg.interpolate_offset) / g
    sw = (pw + cfg.interpolate_offset) / g
    mh = jnp.asarray(cubic_resize_matrix(g, ph, scale=sh))
    mw = jnp.asarray(cubic_resize_matrix(g, pw, scale=sw))
    patch_pos = jnp.einsum("oh,hwd->owd", mh, patch_pos)
    patch_pos = jnp.einsum("pw,owd->opd", mw, patch_pos)
    patch_pos = patch_pos.reshape(1, ph * pw, dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def _ffn(bp, y, ffn_layer: str):
    """MLP (mlp.py:17-41) or fused SwiGLU (swiglu_ffn.py:13-63, vitg)."""
    if ffn_layer == "mlp":
        y = vnn.linear(bp["mlp"]["fc1"], y)
        y = vnn.gelu(y)
        return vnn.linear(bp["mlp"]["fc2"], y)
    # swiglufused: w12 -> split -> silu(x1)*x2 -> w3
    h = vnn.linear(bp["mlp"]["w12"], y)
    x1, x2 = jnp.split(h, 2, axis=-1)
    return vnn.linear(bp["mlp"]["w3"], jax.nn.silu(x1) * x2)


def _block_step(carry, bp, *, num_heads: int, use_pallas, ffn_layer="mlp",
                collect_stats: bool = False):
    """One pre-norm ViT block (reference dinov2_layers/block.py:82-107).

    If bp carries a "qs" leaf (ops/quant.py::quantize_encoder), the six hot
    matmuls run w8a8 int8 with static activation scales. With collect_stats,
    the scan ys are the per-site activation absmaxes used to calibrate those
    scales.
    """
    x = carry
    n, s, d = x.shape
    dh = d // num_heads
    qs = bp.get("qs") if isinstance(bp, dict) else None
    stats = {}

    y = vnn.layer_norm(bp["norm1"], x, eps=1e-6)
    if collect_stats:
        stats["qkv"] = quant_ops.amax(y)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and s >= 256
    packed_ok = num_heads % 2 == 0 and (2 * dh) % 128 == 0
    if qs is not None:
        yq = quant_ops.quant_act(y, qs["qkv"])
        q = quant_ops.qlinear(bp["attn"]["q"], yq, qs["qkv"], x.dtype)
        k = quant_ops.qlinear(bp["attn"]["k"], yq, qs["qkv"], x.dtype)
        v = quant_ops.qlinear(bp["attn"]["v"], yq, qs["qkv"], x.dtype)
        # int8 QK (when the stats tree carries q_out/k_out scales): the
        # re-quantization fuses into the q/k matmul epilogues under XLA,
        # and the flash kernel contracts int8->int32 at the doubled int8
        # MXU rate (measured 1.049x the bf16 kernel at the vitl shape —
        # the fp32 score tile's softmax sweeps bound the kernel).
        qk8 = "q_out" in qs
        if qk8:
            q8 = quant_ops.quant_act(q, qs["q_out"])
            k8 = quant_ops.quant_act(k, qs["k_out"])
        if qk8 and use_pallas and packed_ok:
            from ..ops.pallas_attention import flash_attention_packed_qk8
            scales = jnp.stack([qs["q_out"] * (dh ** -0.5 / 127.0),
                                qs["k_out"] / 127.0])
            o = flash_attention_packed_qk8(q8, k8, v, scales,
                                           num_heads=num_heads)
        else:
            if qk8:
                # Mirror the kernel's quantization on the XLA path so every
                # backend shares the int8 semantics (and the CPU accuracy
                # budget test measures the real thing).
                q = q8.astype(x.dtype) * (qs["q_out"] / 127.0).astype(x.dtype)
                k = k8.astype(x.dtype) * (qs["k_out"] / 127.0).astype(x.dtype)
            if use_pallas and packed_ok:
                from ..ops.pallas_attention import flash_attention_packed
                o = flash_attention_packed(q, k, v, num_heads=num_heads,
                                           scale=dh ** -0.5)
            else:
                def split(t):
                    return t.reshape(n, s, num_heads, dh).transpose(0, 2, 1, 3)
                o = attn_ops.mha(split(q), split(k), split(v),
                                 use_pallas=use_pallas)
                o = o.transpose(0, 2, 1, 3).reshape(n, s, d)
    elif use_pallas and packed_ok:
        # Packed kernel consumes the projections' natural [N, S, H*dh]
        # layout — no head-split transposes/copies anywhere. (A fused
        # single-qkv-matmul variant, flash_attention_qkv_fused, measured
        # ~1 ms/frame SLOWER on v5e: K/V block DMAs from the 3C-wide fused
        # array stride 3x wider.)
        from ..ops.pallas_attention import flash_attention_packed
        q = vnn.linear(bp["attn"]["q"], y)
        k = vnn.linear(bp["attn"]["k"], y)
        v = vnn.linear(bp["attn"]["v"], y)
        if collect_stats:
            stats["q_out"], stats["k_out"] = quant_ops.amax(q), quant_ops.amax(k)
        o = flash_attention_packed(q, k, v, num_heads=num_heads,
                                   scale=dh ** -0.5)
    else:
        def head_proj(p):
            # [N,S,D] @ [D,H,dh] -> [N,H,S,dh]: head split fused in.
            w = p["w"].astype(y.dtype).reshape(d, num_heads, dh)
            out = jnp.einsum("nsd,dhk->nhsk", y, w,
                             preferred_element_type=y.dtype)
            return out + p["b"].astype(y.dtype).reshape(num_heads, 1, dh)

        hq = head_proj(bp["attn"]["q"])
        hk = head_proj(bp["attn"]["k"])
        if collect_stats:
            stats["q_out"], stats["k_out"] = quant_ops.amax(hq), quant_ops.amax(hk)
        o = attn_ops.mha(hq, hk, head_proj(bp["attn"]["v"]),
                         use_pallas=use_pallas)            # [N,H,S,dh]
        o = o.transpose(0, 2, 1, 3).reshape(n, s, d)
    if collect_stats:
        stats["proj"] = quant_ops.amax(o)
    if qs is not None:
        o = quant_ops.qlinear(bp["attn"]["proj"],
                              quant_ops.quant_act(o, qs["proj"]),
                              qs["proj"], x.dtype)
    else:
        o = vnn.linear(bp["attn"]["proj"], o)
    x = x + bp["ls1"]["gamma"].astype(x.dtype) * o

    y = vnn.layer_norm(bp["norm2"], x, eps=1e-6)
    if collect_stats:
        stats["fc1"] = quant_ops.amax(y)
    if qs is not None and "w_i8" in bp["mlp"].get("fc1", {}):
        h = quant_ops.qlinear(bp["mlp"]["fc1"],
                              quant_ops.quant_act(y, qs["fc1"]),
                              qs["fc1"], x.dtype)
        g = vnn.gelu(h)
        y = quant_ops.qlinear(bp["mlp"]["fc2"],
                              quant_ops.quant_act(g, qs["fc2"]),
                              qs["fc2"], x.dtype)
    elif qs is not None and "w_i8" in bp["mlp"].get("w12", {}):
        # Quantized fused SwiGLU (vitg): the "fc1"/"fc2" stat slots carry
        # the w12-input / w3-input absmaxes (same two matmul sites).
        h = quant_ops.qlinear(bp["mlp"]["w12"],
                              quant_ops.quant_act(y, qs["fc1"]),
                              qs["fc1"], x.dtype)
        x1, x2 = jnp.split(h, 2, axis=-1)
        g = jax.nn.silu(x1) * x2
        y = quant_ops.qlinear(bp["mlp"]["w3"],
                              quant_ops.quant_act(g, qs["fc2"]),
                              qs["fc2"], x.dtype)
    elif collect_stats and ffn_layer == "mlp":
        h = vnn.linear(bp["mlp"]["fc1"], y)
        g = vnn.gelu(h)
        stats["fc2"] = quant_ops.amax(g)
        y = vnn.linear(bp["mlp"]["fc2"], g)
    elif collect_stats:
        # swiglufused calibration: absmax of the w3 input (silu(x1)*x2).
        h = vnn.linear(bp["mlp"]["w12"], y)
        x1, x2 = jnp.split(h, 2, axis=-1)
        g = jax.nn.silu(x1) * x2
        stats["fc2"] = quant_ops.amax(g)
        y = vnn.linear(bp["mlp"]["w3"], g)
    else:
        y = _ffn(bp, y, ffn_layer)
    x = x + bp["ls2"]["gamma"].astype(x.dtype) * y
    return x, (stats if collect_stats else None)


def _slice_blocks(blocks, start: int, stop: int):
    return jax.tree.map(lambda a: a[start:stop], blocks)


def _embed_tokens(params, x: jax.Array, cfg: ViTConfig):
    """Patch embed + cls token + interpolated pos embed (dinov2.py:212-231)."""
    n, h, w, _ = x.shape
    p = cfg.patch_size
    ph, pw = h // p, w // p
    tokens = vnn.conv2d(params["patch_embed"]["proj"], x, stride=p)
    tokens = tokens.reshape(n, ph * pw, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (n, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = interpolate_pos_encoding(params["pos_embed"], ph, pw, cfg)
    return tokens + pos.astype(tokens.dtype)


def get_intermediate_layers(params, x: jax.Array, cfg: ViTConfig,
                            taps, use_pallas=None):
    """Run the encoder, returning [(patch_tokens [N,P,D], cls [N,D]), ...]
    for each tap index (post final-norm, as in dinov2.py:297-321 norm=True).

    x: [N, H, W, 3] with H, W multiples of patch_size. Blocks after the last
    tap are skipped (they cannot affect the outputs).
    """
    tokens = _embed_tokens(params, x, cfg)

    step = partial(_block_step, num_heads=cfg.num_heads, use_pallas=use_pallas,
                   ffn_layer=cfg.ffn_layer)
    outs = []
    start = 0
    for t in taps:
        seg = _slice_blocks(params["blocks"], start, t + 1)
        tokens, _ = jax.lax.scan(step, tokens, seg)
        outs.append(tokens)
        start = t + 1

    results = []
    for o in outs:
        o = vnn.layer_norm(params["norm"], o, eps=1e-6)
        results.append((o[:, 1:, :], o[:, 0, :]))
    return results


def calibrate_encoder_stats(params, x: jax.Array, cfg: ViTConfig, taps,
                            use_pallas=None):
    """One calibration forward collecting per-block activation absmaxes.

    Returns (results, stats): `results` are the tap features exactly as
    get_intermediate_layers returns them (so head calibration can continue
    from here without a second encoder pass), `stats` is
    {"qkv"|"proj"|"fc1"|"fc2": [L'] fp32} with L' = last tap + 1 (later
    blocks never run at inference). Feed stats to
    ops/quant.py::quantize_encoder. For the fused-SwiGLU FFN (vitg) the
    "fc1"/"fc2" slots carry the w12-input / w3-input absmaxes.
    """
    tokens = _embed_tokens(params, x, cfg)
    step = partial(_block_step, num_heads=cfg.num_heads, use_pallas=use_pallas,
                   ffn_layer=cfg.ffn_layer, collect_stats=True)
    segs = []
    outs = []
    start = 0
    for t in taps:
        seg = _slice_blocks(params["blocks"], start, t + 1)
        tokens, ys = jax.lax.scan(step, tokens, seg)
        segs.append(ys)
        outs.append(tokens)
        start = t + 1
    results = []
    for o in outs:
        o = vnn.layer_norm(params["norm"], o, eps=1e-6)
        results.append((o[:, 1:, :], o[:, 0, :]))
    stats = {k: jnp.concatenate([s[k] for s in segs]) for k in segs[0]}
    return results, stats


# ---------------------------------------------------------------------------
# Initialization (timm-style trunc normal for linears, dinov2.py:172-177,
# 331-336). Pure NumPy — see models/video_depth.py init_params for why.
# ---------------------------------------------------------------------------

def _trunc_normal(rng: np.random.Generator, shape, std=0.02):
    x = rng.standard_normal(shape)
    while True:  # resample outside +-2 sigma (torch trunc_normal_ semantics)
        bad = np.abs(x) > 2.0
        if not bad.any():
            break
        x[bad] = rng.standard_normal(bad.sum())
    return (std * x).astype(np.float32)


def init_encoder_params(rng: np.random.Generator, cfg: ViTConfig):
    d = cfg.embed_dim
    n = cfg.num_patches

    def lin(din, dout, std=0.02):
        return {"w": _trunc_normal(rng, (din, dout), std),
                "b": np.zeros((dout,), np.float32)}

    def ln():
        return {"scale": np.ones((d,), np.float32),
                "bias": np.zeros((d,), np.float32)}

    hidden = int(d * cfg.mlp_ratio)
    if cfg.ffn_layer == "mlp":
        def ffn():
            return {"fc1": lin(d, hidden), "fc2": lin(hidden, d)}
    else:  # swiglufused hidden sizing (swiglu_ffn.py:54-57)
        sw_hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
        def ffn():
            return {"w12": lin(d, 2 * sw_hidden), "w3": lin(sw_hidden, d)}
    block_list = []
    for _ in range(cfg.depth):
        block_list.append({
            "norm1": ln(),
            "attn": {
                "q": lin(d, d),
                "k": lin(d, d),
                "v": lin(d, d),
                "proj": lin(d, d),
            },
            "ls1": {"gamma": np.full((d,), cfg.init_values, np.float32)},
            "norm2": ln(),
            "mlp": ffn(),
            "ls2": {"gamma": np.full((d,), cfg.init_values, np.float32)},
        })
    blocks = jax.tree.map(lambda *xs: np.stack(xs), *block_list)

    fan = cfg.patch_size * cfg.patch_size * 3
    return {
        "cls_token": (1e-6 * rng.standard_normal((1, 1, d))).astype(np.float32),
        "pos_embed": _trunc_normal(rng, (1, 1 + n, d)),
        "mask_token": np.zeros((1, d), np.float32),
        "patch_embed": {"proj": {
            "w": _trunc_normal(rng, (cfg.patch_size, cfg.patch_size, 3, d),
                               std=math.sqrt(1.0 / fan)),
            "b": np.zeros((d,), np.float32),
        }},
        "blocks": blocks,
        "norm": ln(),
    }
