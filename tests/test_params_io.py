"""Native checkpoint save/load roundtrip + resolution order."""
import os

import numpy as np

import jax

from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.utils import params_io


def test_npz_roundtrip(tmp_path):
    cfg = ModelConfig(
        encoder="_tinyio",
        vit_override=ViTConfig(embed_dim=32, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32),
                      num_frames=4, taps=(0, 1, 1, 1))
    params = init_params(0, cfg)
    path = str(tmp_path / "ckpt.npz")
    params_io.save_params(path, params)
    loaded = params_io.load_params(path)

    flat_a = params_io.flatten_tree(params)
    flat_b = params_io.flatten_tree(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_resolve_checkpoint_prefers_native(tmp_path):
    d = str(tmp_path)
    open(os.path.join(d, "video_depth_anything_vits.pth"), "w").close()
    assert params_io.resolve_checkpoint("vits", checkpoint_dir=d).endswith(".pth")
    open(os.path.join(d, "video_depth_anything_vits.npz"), "w").close()
    assert params_io.resolve_checkpoint("vits", checkpoint_dir=d).endswith(".npz")
    assert params_io.resolve_checkpoint("vitl", checkpoint_dir=d) is None
    open(os.path.join(d, "metric_video_depth_anything_vitl.pth"), "w").close()
    assert params_io.resolve_checkpoint("vitl", metric=True,
                                        checkpoint_dir=d) is not None
