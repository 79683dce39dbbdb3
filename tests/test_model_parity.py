"""Golden parity: JAX model vs the PyTorch reference (random weights).

Strategy per SURVEY.md §4: build the pristine reference model on CPU with a
fixed seed, convert its state_dict through utils/torch_convert, and compare
fp32 forward outputs within float tolerance.
"""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.models import dinov2, video_depth
from video_depth_anything_tpu.utils.torch_convert import from_torch_module

from reference_oracle import build_torch_model

T = 4
HW = 112  # 8x8 patch grid -> exercises pos-embed interpolation


@pytest.fixture(scope="module")
def models():
    tm = build_torch_model("vits", num_frames=T)
    cfg = get_model_config("vits", num_frames=T)
    params = from_torch_module(tm, cfg)
    return tm, cfg, params


@pytest.fixture(scope="module")
def video():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, T, 3, HW, HW), dtype=np.float32)


def test_encoder_parity(models, video):
    tm, cfg, params = models
    x = video.reshape(T, 3, HW, HW)
    with torch.no_grad():
        ref = tm.pretrained.get_intermediate_layers(
            torch.from_numpy(x), cfg.intermediate_layer_idx, return_class_token=True)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = dinov2.get_intermediate_layers(
        params["pretrained"], x_nhwc, cfg.vit, cfg.intermediate_layer_idx,
        use_pallas=False)

    for i, ((r_patch, r_cls), (g_patch, g_cls)) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g_patch), r_patch.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"patch tokens tap {i}")
        np.testing.assert_allclose(
            np.asarray(g_cls), r_cls.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"cls token tap {i}")


def test_full_forward_parity(models, video):
    tm, cfg, params = models
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(video)).numpy()  # [B,T,H,W]

    x_nhwc = jnp.asarray(video.transpose(0, 1, 3, 4, 2))
    got = np.asarray(video_depth.forward(params, x_nhwc, cfg, use_pallas=False))

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4 * max(scale, 1.0))


def test_pos_embed_identity_path(models):
    """518 input -> 37x37 grid == stored pos_embed, no interpolation."""
    tm, cfg, params = models
    pos = dinov2.interpolate_pos_encoding(params["pretrained"]["pos_embed"], 37, 37, cfg.vit)
    np.testing.assert_array_equal(np.asarray(pos),
                                  np.asarray(params["pretrained"]["pos_embed"]))
