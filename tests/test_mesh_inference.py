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


def test_sharded_inference_with_cache_matches_cache_off():
    """Mesh-sharded windows with the keyframe feature cache ON (the
    dedup-encode path shards the new-frame batch over "data") must equal
    the cache-off sharded run exactly (VERDICT r3 item 5)."""
    cfg = ModelConfig(
        encoder="_tinymeshc",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=32,
                      taps=(0, 0, 1, 1))
    params = init_params(0, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(112, 42, 56, 3), dtype=np.uint8)

    mesh = make_mesh(n_data=4, n_model=2)
    pipe = VideoDepthPipeline(cfg, params, mesh=mesh, use_pallas=False)
    off, _ = pipe.infer_video_depth(frames, input_size=28, fp32=True,
                                    windows_per_batch=4,
                                    cache_keyframe_features=False)
    on, _ = pipe.infer_video_depth(frames, input_size=28, fp32=True,
                                   windows_per_batch=4,
                                   cache_keyframe_features=True)
    # Not bit-parity under a mesh: the cached path encodes shape-bucketed
    # frame batches (round-5 steady bucket, pipeline/infer.py) while the
    # plain path encodes [C,32,...] windows, so XLA picks different
    # tilings and float accumulation orders (measured: a handful of
    # elements at ~1e-6). Bit-level cache parity is pinned single-device
    # by test_pipeline_parity.py::test_keyframe_feature_cache_exact.
    np.testing.assert_allclose(on, off, rtol=1e-5, atol=1e-5)
    # single-device unsharded oracle
    single = VideoDepthPipeline(cfg, params, use_pallas=False)
    ref, _ = single.infer_video_depth(frames, input_size=28, fp32=True,
                                      cache_keyframe_features=False)
    np.testing.assert_allclose(on, ref, rtol=2e-4, atol=2e-4)


def test_vitl_dims_tp_specs_divide():
    """The TP rules at the real vitl dims (1024 d / 16 heads / 4096 MLP):
    every 'model'-sharded leaf divides evenly on a model=2 mesh, so no
    silent replication-fallback (parallel/mesh.py::param_shardings drops
    non-dividing axes)."""
    import jax.numpy as jnp

    from video_depth_anything_tpu.parallel.mesh import param_shardings

    mesh = make_mesh(n_data=4, n_model=2)
    d, hidden, depth = 1024, 4096, 2
    tree = {"pretrained": {"blocks": {
        "attn": {"q": {"w": jnp.zeros((depth, d, d))},
                 "proj": {"w": jnp.zeros((depth, d, d))}},
        "mlp": {"fc1": {"w": jnp.zeros((depth, d, hidden)),
                        "b": jnp.zeros((depth, hidden))},
                "fc2": {"w": jnp.zeros((depth, hidden, d))}},
    }}}
    sh = param_shardings(tree, mesh)
    blocks = sh["pretrained"]["blocks"]
    assert "model" in str(blocks["attn"]["q"]["w"].spec)
    assert "model" in str(blocks["mlp"]["fc1"]["w"].spec)
    assert "model" in str(blocks["mlp"]["fc2"]["w"].spec)


def test_non_dividing_dim_falls_back_to_replication():
    """A 'model'-sharded axis whose dim doesn't divide the mesh axis is
    dropped (replicated) instead of erroring (parallel/mesh.py fallback)."""
    import jax.numpy as jnp

    from jax.sharding import PartitionSpec as P

    from video_depth_anything_tpu.parallel.mesh import param_shardings

    mesh = make_mesh(n_data=4, n_model=2)
    # fc1/w rule is P(None, None, "model"); hidden 37 % 2 != 0 -> replicate
    tree = {"pretrained": {"blocks": {"mlp": {
        "fc1": {"w": jnp.zeros((2, 16, 37))}}}}}
    sh = param_shardings(tree, mesh)
    assert sh["pretrained"]["blocks"]["mlp"]["fc1"]["w"].spec == \
        P(None, None, None)
