"""Multi-host training path (parallel/distributed.py).

The reference has no distributed backend at all (SURVEY §2.7: grep finds
only torch.nn.DataParallel, test_train.py:386-388); this is the TPU-native
extension: jax.distributed.initialize + global mesh + per-host feeding.
Exercised for real with 2 OS processes x 2 virtual CPU devices each (gloo
collectives), compared against a single-process oracle on the same global
batch.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "dist_worker.py")


def _oracle_loss(steps: int) -> float:
    """Same toy model/batch as dist_worker.py, single process, no mesh."""
    from video_depth_anything_tpu.config import (ModelConfig,
                                                 ViTConfig)
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.training.train_state import (
        TrainConfig, create_train_state, train_step)

    cfg = ModelConfig(
        encoder="_tinydist",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=4,
                      taps=(0, 0, 1, 1))
    tc = TrainConfig(learning_rate=3e-3, epochs=1, steps_per_epoch=10,
                     compute_dtype="float32", ratio_tgm=1.0)
    state = create_train_state(init_params(0, cfg), tc)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((4, 4, 28, 28, 3)),
                             jnp.float32),
        "gt": jnp.asarray(rng.random((4, 4, 28, 28)), jnp.float32),
        "mask": jnp.ones((4, 4, 28, 28), jnp.float32),
    }
    for _ in range(steps):
        state, metrics = train_step(state, batch, cfg, tc)
    return float(metrics["loss"])


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_matches_single_process():
    steps = 2
    port = _free_port()
    procs = []
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=ROOT, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, step = line.split()
                results[int(pid)] = (float(loss), int(step))
    assert set(results) == {0, 1}, results
    # Replicated loss: both processes must agree exactly.
    assert results[0] == results[1], results
    assert results[0][1] == steps
    # And match the single-process oracle on the same global batch
    # (reduction order differs across mesh sizes -> small fp tolerance).
    oracle = _oracle_loss(steps)
    assert abs(results[0][0] - oracle) < 5e-4 * max(abs(oracle), 1.0), \
        (results[0][0], oracle)


def test_two_process_inference_matches_single_process(tmp_path):
    """Mesh-sharded window inference across 2 OS processes (gloo) must
    reproduce the single-process pipeline on the same frames — the serving
    analogue of the training test above."""
    port = _free_port()
    worker = os.path.join(ROOT, "tests", "dist_infer_worker.py")
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"depths_{pid}.npy")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=ROOT, text=True))
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"

    a = np.load(outs[0])
    b = np.load(outs[1])
    # Every host must hold the identical full result (allgathered fetch).
    np.testing.assert_array_equal(a, b)

    # Single-process oracle: same tiny model/frames through the same API.
    from video_depth_anything_tpu.config import ModelConfig, ViTConfig
    from video_depth_anything_tpu.models.video_depth import init_params
    from video_depth_anything_tpu.pipeline import VideoDepthPipeline

    cfg = ModelConfig(
        encoder="_tinydinf",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32), num_frames=32,
        taps=(0, 0, 1, 1))
    params = init_params(0, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(70, 42, 56, 3), dtype=np.uint8)
    single = VideoDepthPipeline(cfg, params, use_pallas=False)
    ref, _ = single.infer_video_depth(frames, input_size=28, fp32=True)
    np.testing.assert_allclose(a, ref, rtol=2e-4, atol=2e-4)


def test_loader_sharding_partitions_epoch():
    from video_depth_anything_tpu.data.loader import DataLoader

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    seen = []
    for shard in range(2):
        dl = DataLoader(Toy(), batch_size=1, shuffle=True, seed=7,
                        num_shards=2, shard_id=shard)
        assert len(dl) == 5
        seen.append([int(b["x"][0, 0]) for b in dl])
    # Disjoint cover of the (shuffled) epoch.
    assert not (set(seen[0]) & set(seen[1]))
    assert len(set(seen[0]) | set(seen[1])) == 10
