"""Mesh-sharded window inference == single-device inference (8 CPU devices)."""
import numpy as np

import jax

from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.parallel import make_mesh
from video_depth_anything_tpu.pipeline import VideoDepthPipeline


def test_sharded_inference_matches_single_device():
    cfg = ModelConfig(
        encoder="_tinymesh",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=32,
                      taps=(0, 0, 1, 1))
    params = init_params(0, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(70, 42, 56, 3), dtype=np.uint8)

    single = VideoDepthPipeline(cfg, params, use_pallas=False)
    a, _ = single.infer_video_depth(frames, input_size=28, fp32=True)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = VideoDepthPipeline(cfg, params, mesh=mesh, use_pallas=False)
    b, _ = sharded.infer_video_depth(frames, input_size=28, fp32=True,
                                     windows_per_batch=4)
    assert jax.device_count() == 8
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
