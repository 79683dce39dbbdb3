"""AOT serving artifact: export -> serialize -> deserialize -> run == pipeline.

The exported StableHLO window program (utils/serving_export.py) must
reproduce `VideoDepthPipeline.infer_video_depth`'s per-window forward
bit-for-bit after a disk round-trip, including the in-graph preprocess and
the upsample back to source resolution.
"""
import numpy as np

import jax

from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.pipeline import VideoDepthPipeline
from video_depth_anything_tpu.utils import serving_export


def _toy_cfg():
    return ModelConfig(
        encoder="_tinyexport",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=32,
        taps=(0, 0, 1, 1))


def test_export_roundtrip_matches_pipeline(tmp_path):
    cfg = _toy_cfg()
    params = init_params(0, cfg)
    rng = np.random.default_rng(1)
    src_hw = (42, 56)
    win = rng.integers(0, 256, size=(1, 32, *src_hw, 3), dtype=np.uint8)

    exp = serving_export.export_window_program(cfg, src_hw, input_size=28,
                                               fp32=True)
    path = str(tmp_path / "window.vda")
    serving_export.save_exported(exp, path, {"encoder": cfg.encoder})
    loaded = serving_export.load_exported(path)

    p = serving_export.cast_params(params, fp32=True)
    got = np.asarray(loaded.call(p, win))

    # Oracle: the live pipeline window fn at the same derived net_hw.
    pipe = VideoDepthPipeline(cfg, params, use_pallas=False)
    from video_depth_anything_tpu.pipeline import preprocess
    eff = preprocess.effective_input_size(*src_hw, 28)
    net_hw = preprocess.network_input_hw(*src_hw, eff)
    fwd = pipe._window_fn(net_hw=net_hw, src_hw=src_hw, dtype=np.float32)
    want = np.asarray(fwd(p, win))

    assert got.shape == (1, 32, *src_hw)
    np.testing.assert_array_equal(got, want)

    # Metadata sidecar is present and self-describing.
    import json
    meta = json.load(open(path + ".json"))
    assert meta["format"].startswith("vda-tpu-window-program")
    assert meta["encoder"] == cfg.encoder


def test_export_int8_quantized_tree(tmp_path):
    """int8 artifact: quantized-pytree avals, bit-exact vs direct forward."""
    import jax.numpy as jnp

    from video_depth_anything_tpu.pipeline import preprocess

    cfg = _toy_cfg()
    params = init_params(0, cfg)
    rng = np.random.default_rng(3)
    src_hw = (28, 28)
    win = rng.integers(0, 256, size=(1, 32, *src_hw, 3), dtype=np.uint8)
    eff = preprocess.effective_input_size(*src_hw, 28)
    net_hw = preprocess.network_input_hw(*src_hw, eff)

    p_q = serving_export.quantize_for_serving(params, win, cfg, net_hw,
                                              fp32=True)
    # Quantization actually happened (int8 leaves exist in the tree).
    leaves = jax.tree.leaves(p_q)
    assert any(a.dtype == jnp.int8 for a in leaves)

    exp = serving_export.export_window_program(cfg, src_hw, input_size=28,
                                               fp32=True, quant="int8")
    loaded = jax.export.deserialize(exp.serialize())
    got = np.asarray(loaded.call(p_q, win))

    oracle = jax.jit(serving_export.build_window_fn(
        cfg, net_hw, src_hw, np.float32, 1))
    want = np.asarray(oracle(p_q, win))
    np.testing.assert_array_equal(got, want)


def test_export_bf16_and_batched_windows(tmp_path):
    cfg = _toy_cfg()
    params = init_params(0, cfg)
    rng = np.random.default_rng(2)
    src_hw = (28, 28)
    win = rng.integers(0, 256, size=(2, 32, *src_hw, 3), dtype=np.uint8)

    exp = serving_export.export_window_program(cfg, src_hw, input_size=28,
                                               fp32=False,
                                               windows_per_batch=2)
    loaded = jax.export.deserialize(exp.serialize())
    p = serving_export.cast_params(params, fp32=False)
    out = np.asarray(loaded.call(p, win))
    assert out.shape == (2, 32, *src_hw)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
