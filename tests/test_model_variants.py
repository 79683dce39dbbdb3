"""Model-variant parity: use_clstoken / use_bn / SwiGLU FFN / RoPE."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.models import video_depth
from video_depth_anything_tpu.utils.torch_convert import from_torch_module

from reference_oracle import load_reference

T, HW = 2, 56


def _build_variant(**kwargs):
    VideoDepthAnything = load_reference()
    torch.manual_seed(1)
    m = VideoDepthAnything(encoder="vits", features=64,
                           out_channels=[48, 96, 192, 384], num_frames=T,
                           **kwargs)
    m.eval()
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "proj_out" in name or "cls_token" in name:
                p.add_(0.02 * torch.randn_like(p))
    return m


@pytest.mark.parametrize("kwargs,cfg_kwargs", [
    (dict(use_clstoken=True), dict(use_clstoken=True)),
    (dict(use_bn=True), dict(use_bn=True)),
    (dict(pe="rope"), dict(pe="rope")),
])
def test_variant_forward_parity(kwargs, cfg_kwargs):
    tm = _build_variant(**kwargs)
    cfg = get_model_config("vits", num_frames=T, **cfg_kwargs)
    params = from_torch_module(tm, cfg)
    if cfg.pe == "rope":
        # RoPE table is not a checkpoint tensor; attach the precomputed one.
        from video_depth_anything_tpu.models.motion import rope_freqs_cis
        for mm in params["head"]["motion_modules"].values():
            for blk in mm["temporal_transformer"]["transformer_blocks"].values():
                for ab in blk["attention_blocks"].values():
                    c = ab["to_q"]["w"].shape[0]
                    ab["_freqs_cis"] = rope_freqs_cis(c, T)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, 3, HW, HW), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()
    got = np.asarray(video_depth.forward(
        params, jnp.asarray(x.transpose(0, 1, 3, 4, 2)), cfg, use_pallas=False))
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4 * scale)


def test_swiglu_ffn_parity():
    """SwiGLUFFNFused (swiglu_ffn.py:13-63, the vitg FFN) vs torch."""
    import sys
    if "/root/reference/metric_depth" not in sys.path:
        sys.path.insert(0, "/root/reference/metric_depth")
    from video_depth_anything.dinov2_layers import SwiGLUFFNFused

    from video_depth_anything_tpu.models.dinov2 import _ffn

    torch.manual_seed(0)
    d = 64
    mod = SwiGLUFFNFused(in_features=d, hidden_features=4 * d).eval()
    sw_hidden = (int(4 * d * 2 / 3) + 7) // 8 * 8
    assert mod.w12.weight.shape == (2 * sw_hidden, d)
    bp = {"mlp": {
        "w12": {"w": jnp.asarray(mod.w12.weight.detach().numpy().T),
                "b": jnp.asarray(mod.w12.bias.detach().numpy())},
        "w3": {"w": jnp.asarray(mod.w3.weight.detach().numpy().T),
               "b": jnp.asarray(mod.w3.bias.detach().numpy())},
    }}
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 7, d)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    got = np.asarray(_ffn(bp, jnp.asarray(x), "swiglufused"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
