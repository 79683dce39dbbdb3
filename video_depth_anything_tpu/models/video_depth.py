"""VideoDepthAnything — full model: DINOv2 encoder + temporal DPT head.

Parity with reference video_depth.py:37-164 (pristine variant
metric_depth/video_depth_anything/video_depth.py:35-65): flatten (B,T) into
the batch, run the encoder's 4 intermediate taps, decode with the
DPT-temporal head (4 TemporalModules on layer_3 / layer_4 / path_4 / path_3,
dpt_temporal.py:53-114), bilinear-upsample to input resolution and ReLU.

The reference's micro_batch_size frame chunking (dpt_temporal.py:101-114)
is a CUDA memory workaround; under XLA the whole head is one fused graph,
so it is intentionally not replicated (kept as a no-op arg for API parity).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops import nn as vnn
from ..ops.resize import resize_bilinear_align_corners
from . import dinov2, dpt
from .motion import sinusoidal_pe, temporal_module


def _head_forward(p, feats, ph: int, pw: int, b: int, t: int, cfg: ModelConfig,
                  fp32_island: bool = True, train: bool = False,
                  collect_stats: bool = False):
    """DPTHeadTemporal.forward (dpt_temporal.py:53-114).

    feats: list of 4 (patch_tokens [B*T, P, D], cls [B*T, D]) tuples.
    Returns depth [B*T, 14*ph, 14*pw, 1] (fp32 when fp32_island); with
    collect_stats, (depth, {"0".."3": motion-module stat trees}) for int8
    calibration (ops/quant.py::quantize_motion_module).
    """
    n = feats[0][0].shape[0]
    d = feats[0][0].shape[-1]
    if cfg.use_clstoken:
        # readout projection (dpt.py:92-98,129-132)
        grids = []
        for i, (x, cls) in enumerate(feats):
            readout = jnp.broadcast_to(cls[:, None, :], x.shape)
            y = jnp.concatenate([x, readout], axis=-1)
            y = vnn.linear(p["readout_projects"][str(i)]["0"], y)
            y = vnn.gelu(y)
            grids.append(y.reshape(n, ph, pw, d))
    else:
        grids = [x.reshape(n, ph, pw, d) for x, _ in feats]

    layer_1 = vnn.conv_transpose2d(
        p["resize_layers"]["0"], vnn.conv2d(p["projects"]["0"], grids[0]), stride=4)
    layer_2 = vnn.conv_transpose2d(
        p["resize_layers"]["1"], vnn.conv2d(p["projects"]["1"], grids[1]), stride=2)
    layer_3 = vnn.conv2d(p["projects"]["2"], grids[2])
    layer_4 = vnn.conv2d(
        p["resize_layers"]["3"], vnn.conv2d(p["projects"]["3"], grids[3]),
        stride=2, padding=1)

    mm = p["motion_modules"]
    mkw = dict(num_heads=cfg.num_attention_heads, pe=cfg.pe,
               num_transformer_block=cfg.num_transformer_block,
               num_attention_blocks=cfg.num_attention_blocks,
               collect_stats=collect_stats)
    mstats = {}

    def tmod(key, feat):
        out = temporal_module(mm[key], feat, b, t, **mkw)
        if collect_stats:
            out, mstats[key] = out
        return out

    layer_3 = tmod("0", layer_3)
    layer_4 = tmod("1", layer_4)

    l1rn, l2rn, l3rn, l4rn = dpt.scratch_rn(p, [layer_1, layer_2, layer_3, layer_4])

    # RCUs stay on XLA convs: the fused Pallas RCU measured slower
    # (see models/dpt.py::residual_conv_unit and tools/bench_rcu.py).
    sc = p["scratch"]
    path_4 = dpt.feature_fusion_block(sc["refinenet4"], l4rn,
                                      size=l3rn.shape[-3:-1], use_bn=cfg.use_bn)
    path_4 = tmod("2", path_4)
    path_3 = dpt.feature_fusion_block(sc["refinenet3"], path_4, l3rn,
                                      size=l2rn.shape[-3:-1], use_bn=cfg.use_bn)
    path_3 = tmod("3", path_3)
    path_2 = dpt.feature_fusion_block(sc["refinenet2"], path_3, l2rn,
                                      size=l1rn.shape[-3:-1], use_bn=cfg.use_bn)
    path_1 = dpt.feature_fusion_block(sc["refinenet1"], path_2, l1rn,
                                      use_bn=cfg.use_bn)

    depth = dpt.output_head(p, path_1, (14 * ph, 14 * pw), fp32_island,
                            mixed_island=not train)
    return (depth, mstats) if collect_stats else depth


def forward(params, x: jax.Array, cfg: ModelConfig,
            use_pallas: bool | None = None, fp32_island: bool = True,
            train: bool = False) -> jax.Array:
    """x: [B, T, H, W, 3] (normalized) -> depth [B, T, H, W] fp32, ReLU'd.

    Mirrors VideoDepthAnything.forward (video_depth.py:89-164 pristine path).
    """
    b, t, h, w, _ = x.shape
    ph, pw = h // cfg.vit.patch_size, w // cfg.vit.patch_size
    flat = x.reshape(b * t, h, w, 3)
    feats = dinov2.get_intermediate_layers(
        params["pretrained"], flat, cfg.vit, cfg.intermediate_layer_idx,
        use_pallas=use_pallas)
    depth = _head_forward(params["head"], feats, ph, pw, b, t, cfg, fp32_island,
                          train=train)
    depth = resize_bilinear_align_corners(depth.astype(jnp.float32), (h, w))
    depth = jnp.maximum(depth, 0.0)
    return depth[..., 0].reshape(b, t, h, w)


def calibrate_stats(params, x: jax.Array, cfg: ModelConfig, use_pallas=None):
    """One int8-calibration forward over the full model.

    x: [B, T, H, W, 3] normalized. Returns {"encoder": per-block absmax
    arrays, "motion": per-module stat trees} — feed to quantize_model.
    """
    b, t, h, w, _ = x.shape
    ph, pw = h // cfg.vit.patch_size, w // cfg.vit.patch_size
    flat = x.reshape(b * t, h, w, 3)
    feats, enc_stats = dinov2.calibrate_encoder_stats(
        params["pretrained"], flat, cfg.vit, cfg.intermediate_layer_idx,
        use_pallas=use_pallas)
    _, motion_stats = _head_forward(params["head"], feats, ph, pw, b, t, cfg,
                                    collect_stats=True)
    return {"encoder": enc_stats, "motion": motion_stats}


def quantize_model(params, stats, cfg: ModelConfig):
    """int8-quantize the encoder blocks and the 4 temporal motion modules
    (ops/quant.py). Everything else (DPT convs, norms, output island) stays
    bf16/fp32."""
    from ..ops import quant as quant_ops

    pretrained_q = quant_ops.quantize_encoder(
        params["pretrained"], stats["encoder"], cfg.vit.depth)
    mm = params["head"]["motion_modules"]
    mm_q = {k: quant_ops.quantize_motion_module(mm[k], stats["motion"][k])
            for k in mm}
    head_q = {**params["head"], "motion_modules": mm_q}
    return {**params, "pretrained": pretrained_q, "head": head_q}


# ---------------------------------------------------------------------------
# Initialization — pure NumPy (hundreds of tiny RNG ops would each pay a
# trace+compile+dispatch round trip as jax ops), converted to jnp at the end.
# ---------------------------------------------------------------------------

def _conv_init(rng: np.random.Generator, kh, kw, cin, cout, bias=True):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) ~ U(-b, b)."""
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in)
    p = {"w": rng.uniform(-bound * math.sqrt(3), bound * math.sqrt(3),
                          (kh, kw, cin, cout)).astype(np.float32)}
    if bias:
        p["b"] = rng.uniform(-bound, bound, (cout,)).astype(np.float32)
    return p


def _convT_init(rng: np.random.Generator, k, cin, cout):
    fan_in = k * k * cout  # torch convT fan_in uses weight shape [cin,cout,k,k]
    bound = math.sqrt(1.0 / fan_in)
    return {
        "w": rng.uniform(-bound * math.sqrt(3), bound * math.sqrt(3),
                         (k, k, cout, cin)).astype(np.float32),
        "b": rng.uniform(-bound, bound, (cout,)).astype(np.float32),
    }


def _linear_init(rng: np.random.Generator, din, dout, bias=True):
    bound = math.sqrt(1.0 / din)
    p = {"w": rng.uniform(-bound * math.sqrt(3), bound * math.sqrt(3),
                          (din, dout)).astype(np.float32)}
    if bias:
        p["b"] = rng.uniform(-bound, bound, (dout,)).astype(np.float32)
    return p


def _ln_init(d):
    return {"scale": np.ones((d,), np.float32), "bias": np.zeros((d,), np.float32)}


def _bn_init(c):
    return {"scale": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32),
            "mean": np.zeros((c,), np.float32), "var": np.ones((c,), np.float32)}


def _rcu_init(rng, features, use_bn=False):
    p = {"conv1": _conv_init(rng, 3, 3, features, features),
         "conv2": _conv_init(rng, 3, 3, features, features)}
    if use_bn:
        p["bn1"] = _bn_init(features)
        p["bn2"] = _bn_init(features)
    return p


def _fusion_init(rng, features, use_bn=False):
    return {
        "out_conv": _conv_init(rng, 1, 1, features, features),
        "resConfUnit1": _rcu_init(rng, features, use_bn),
        "resConfUnit2": _rcu_init(rng, features, use_bn),
    }


def _motion_init(rng, c, cfg: ModelConfig):
    inner = c

    def attn_block():
        p = {
            "to_q": _linear_init(rng, inner, inner, bias=False),
            "to_k": _linear_init(rng, inner, inner, bias=False),
            "to_v": _linear_init(rng, inner, inner, bias=False),
            "to_out": {"0": _linear_init(rng, inner, inner)},
        }
        if cfg.pe == "ape":
            p["pos_encoder"] = {"pe": sinusoidal_pe(inner, cfg.num_frames)}
        return p

    blocks = {}
    for i in range(cfg.num_transformer_block):
        blocks[str(i)] = {
            "attention_blocks": {str(j): attn_block()
                                 for j in range(cfg.num_attention_blocks)},
            "norms": {str(j): _ln_init(inner)
                      for j in range(cfg.num_attention_blocks)},
            "ff": {"net": {"0": {"proj": _linear_init(rng, inner, 8 * inner)},
                           "2": _linear_init(rng, 4 * inner, inner)}},
            "ff_norm": _ln_init(inner),
        }
    # zero_initialize=True (motion_module.py:57-58)
    proj_out = {"w": np.zeros((inner, c), np.float32),
                "b": np.zeros((c,), np.float32)}
    return {"temporal_transformer": {
        "norm": _ln_init(c),
        "proj_in": _linear_init(rng, c, inner),
        "transformer_blocks": blocks,
        "proj_out": proj_out,
    }}


def init_head_params(rng: np.random.Generator, cfg: ModelConfig):
    d = cfg.vit.embed_dim
    f = cfg.features
    oc = list(cfg.out_channels)
    p = {
        "projects": {str(i): _conv_init(rng, 1, 1, d, oc[i]) for i in range(4)},
        "resize_layers": {
            "0": _convT_init(rng, 4, oc[0], oc[0]),
            "1": _convT_init(rng, 2, oc[1], oc[1]),
            "3": _conv_init(rng, 3, 3, oc[3], oc[3]),
        },
        "scratch": {
            **{f"layer{i+1}_rn": _conv_init(rng, 3, 3, oc[i], f, bias=False)
               for i in range(4)},
            **{f"refinenet{i}": _fusion_init(rng, f, cfg.use_bn)
               for i in (1, 2, 3, 4)},
            "output_conv1": _conv_init(rng, 3, 3, f, f // 2),
            "output_conv2": {
                "0": _conv_init(rng, 3, 3, f // 2, 32),
                "2": _conv_init(rng, 1, 1, 32, 1),
            },
        },
        "motion_modules": {
            "0": _motion_init(rng, oc[2], cfg),
            "1": _motion_init(rng, oc[3], cfg),
            "2": _motion_init(rng, f, cfg),
            "3": _motion_init(rng, f, cfg),
        },
    }
    if cfg.use_clstoken:
        p["readout_projects"] = {
            str(i): {"0": _linear_init(rng, 2 * d, d)} for i in range(4)}
    return p


class _ZeroGen:
    """np.random.Generator stand-in returning zeros, for shape-only init.

    The init helpers only call ``standard_normal(shape)`` and
    ``uniform(low, high, size)``; zeros keep every branch trivial (the
    trunc-normal resample loop exits immediately at |0| <= 2 sigma).
    """

    @staticmethod
    def standard_normal(shape=()):
        return np.zeros(shape)

    @staticmethod
    def uniform(low=0.0, high=1.0, size=None):
        return np.zeros(() if size is None else size)


def param_shapes(cfg: ModelConfig):
    """Abstract parameter tree as ShapeDtypeStructs — no RNG, no device data.

    Used by AOT tooling (tools/bench_memory.py) to lower/compile the window
    program without materializing weights. Dtypes are canonicalized the same
    way init_params' final jnp.asarray would (float64 -> float32).
    """
    gen = _ZeroGen()
    tree = {
        "pretrained": dinov2.init_encoder_params(gen, cfg.vit),
        "head": init_head_params(gen, cfg),
    }
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), jax.dtypes.canonicalize_dtype(np.asarray(a).dtype)),
        tree)


def init_params(rng, cfg: ModelConfig):
    """Random-init full parameter tree ({"pretrained": ..., "head": ...}).

    `rng` is an int seed or a jax PRNGKey (seed material only). Init is pure
    NumPy — hundreds of tiny RNG ops as jax calls would each pay a
    trace/compile/dispatch round trip — converted to jnp once at the end.
    """
    if isinstance(rng, (int, np.integer)):
        seed = int(rng)
    else:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
    gen = np.random.default_rng(seed)
    tree = {
        "pretrained": dinov2.init_encoder_params(gen, cfg.vit),
        "head": init_head_params(gen, cfg),
    }
    return jax.tree.map(jnp.asarray, tree)
