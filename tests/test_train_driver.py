"""End-to-end training driver smoke on the synthetic VKITTI fixture."""
import json
import os

import pytest

from video_depth_anything_tpu.config import VIT_CONFIGS, ModelConfig, ViTConfig
from video_depth_anything_tpu.training.train import train

from test_data import _make_vkitti


def test_train_driver_end_to_end(tmp_path):
    root = str(tmp_path / "vkitti")
    _make_vkitti(root, frames=4, hw=(40, 60))

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "hyper_parameter:\n  learning_rate: 1.0e-3\n  epochs: 2\n"
        "  ratio_ssi: 1\n  ratio_tgm: 1\n  patient: 5\n  batch_size: 1\n"
        "  compute_dtype: float32\n")

    VIT_CONFIGS["_tinytrain"] = ViTConfig(embed_dim=64, depth=2, num_heads=2)
    mcfg = ModelConfig(encoder="_tinytrain", features=32,
                       out_channels=(32, 32, 32, 32), num_frames=3,
                       taps=(0, 0, 1, 1))
    out = str(tmp_path / "out")
    train(str(cfg_yaml), data_root=root, out_dir=out, max_steps=2,
          model_cfg=mcfg, resize_size=28)

    # metrics logged, checkpoints + visual dumps written
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert any("train_loss" in r for r in recs)
    assert any("absrel" in r for r in recs)
    assert os.path.exists(os.path.join(out, "latest_checkpoint"))
    assert os.path.exists(os.path.join(out, "best_checkpoint"))
    vis = os.listdir(os.path.join(out, "val_vis"))
    assert any(v.endswith(".png") for v in vis)

    # resume continues from the saved epoch (raise the epoch budget)
    cfg_yaml2 = tmp_path / "cfg2.yaml"
    cfg_yaml2.write_text(
        "hyper_parameter:\n  learning_rate: 1.0e-3\n  epochs: 3\n"
        "  ratio_ssi: 1\n  ratio_tgm: 1\n  patient: 5\n  batch_size: 1\n"
        "  compute_dtype: float32\n")
    train(str(cfg_yaml2), data_root=root, out_dir=out, max_steps=1,
          model_cfg=mcfg, resize_size=28, resume=True)
    recs2 = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl")).read().splitlines()]
    assert len(recs2) > len(recs)

    # export the trained checkpoint to inference .npz and run the pipeline
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.training import checkpoint as ckpt
    from video_depth_anything_tpu.training.train_state import (
        TrainConfig, create_train_state)
    from video_depth_anything_tpu.utils.params_io import load_params, save_params

    import jax
    import numpy as np

    template = create_train_state(init_params(0, mcfg), TrainConfig())
    restored = ckpt.load_checkpoint(out, "best_checkpoint", template=template)
    npz = str(tmp_path / "exported.npz")
    save_params(npz, restored["params"])
    params = load_params(npz)
    a = jax.tree.leaves(restored["params"]["head"])[0]
    b = jax.tree.leaves(params["head"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
