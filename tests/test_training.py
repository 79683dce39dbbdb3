"""End-to-end training smoke: loss decreases, checkpoint/resume works."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.training.train_state import (
    TrainConfig, TrainState, create_train_state, train_step)


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        encoder="_tiny2",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32),
                      num_frames=4, taps=(0, 0, 1, 1))
    tc = TrainConfig(learning_rate=3e-3, epochs=1, steps_per_epoch=10,
                     compute_dtype="float32", ratio_tgm=1.0)
    params = init_params(0, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((2, 4, 28, 28, 3)), jnp.float32),
        "gt": jnp.asarray(rng.random((2, 4, 28, 28)), jnp.float32),
        "mask": jnp.ones((2, 4, 28, 28), jnp.float32),
    }
    return cfg, tc, params, batch


def test_loss_decreases_and_encoder_frozen(tiny):
    cfg, tc, params, batch = tiny
    state = create_train_state(params, tc)
    enc_before = jax.tree.leaves(state.params["pretrained"])[0]
    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch, cfg, tc)
        losses.append(float(metrics["loss"]))
    enc_after = jax.tree.leaves(state.params["pretrained"])[0]
    assert losses[-1] < losses[0], losses
    np.testing.assert_array_equal(np.asarray(enc_before), np.asarray(enc_after))
    assert int(state.step) == 8


def test_checkpoint_roundtrip(tiny, tmp_path):
    from video_depth_anything_tpu.training import checkpoint as ckpt

    cfg, tc, params, batch = tiny
    state = create_train_state(params, tc)
    state, _ = train_step(state, batch, cfg, tc)
    path = ckpt.save_checkpoint(str(tmp_path), "latest_checkpoint", state,
                                {"epoch": 3, "best_val_loss": 0.5, "trial": 1})
    assert os.path.exists(path)
    restored = ckpt.load_checkpoint(str(tmp_path), "latest_checkpoint",
                                    template=create_train_state(params, tc))
    assert int(restored["step"]) == 1
    assert restored["extra"]["epoch"] == 3
    a = jax.tree.leaves(state.params["head"])[0]
    b = jax.tree.leaves(restored["params"]["head"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed state trains on
    state2 = TrainState(step=jnp.asarray(restored["step"]),
                        params=restored["params"],
                        opt_state=restored["opt_state"])
    state2, m = train_step(state2, batch, cfg, tc)
    assert np.isfinite(float(m["loss"]))


def test_validate_metrics_sane():
    from video_depth_anything_tpu.training.validate import metric_val

    rng = np.random.default_rng(1)
    t, h, w = 4, 24, 32
    gt = rng.uniform(2.0, 20.0, (t, h, w))
    pred_disp = (1.0 / gt) * 3.0 + 0.02  # affine of true disparity
    poses = np.stack([np.eye(4)] * t)
    ks = np.stack([np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])] * t)
    absrel, delta1, tae = metric_val(pred_disp.astype(np.float32), gt, poses, ks)
    assert absrel < 0.01
    assert delta1 > 0.99
    assert tae < 1.0  # identity poses -> reprojection is the frame diff
