"""Worker for tests/test_distributed.py (not a pytest module).

Joins an N-process CPU cluster (gloo collectives) and runs sharded train
steps through the package's multi-host APIs: parallel/distributed.py
initialize + global_mesh + process_batch_bounds + host_local_batch_to_global,
training/train_state.py shard_train_state + train_step.

argv: <process_id> <num_processes> <port> <steps>
Prints one line: RESULT <pid> <final_loss> <final_step>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from video_depth_anything_tpu.config import ModelConfig, ViTConfig  # noqa: E402
from video_depth_anything_tpu.models.video_depth import init_params  # noqa: E402
from video_depth_anything_tpu.parallel import distributed as dist  # noqa: E402
from video_depth_anything_tpu.training.train_state import (  # noqa: E402
    TrainConfig, create_train_state, shard_train_state, train_step)


def main():
    pid, nproc, port, steps = (int(sys.argv[1]), int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]))
    dist.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2

    mesh = dist.global_mesh()
    assert mesh.shape["data"] == 2 * nproc

    cfg = ModelConfig(
        encoder="_tinydist",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), num_frames=4,
                      taps=(0, 0, 1, 1))
    tc = TrainConfig(learning_rate=3e-3, epochs=1, steps_per_epoch=10,
                     compute_dtype="float32", ratio_tgm=1.0)
    params = init_params(0, cfg)
    state = shard_train_state(create_train_state(params, tc), mesh)

    # Global batch of 4, identical on every process; each host feeds its rows.
    rng = np.random.default_rng(0)
    gbatch = {
        "video": rng.standard_normal((4, 4, 28, 28, 3)).astype(np.float32),
        "gt": rng.random((4, 4, 28, 28)).astype(np.float32),
        "mask": np.ones((4, 4, 28, 28), np.float32),
    }
    lo, hi = dist.process_batch_bounds(4)
    local = {k: v[lo:hi] for k, v in gbatch.items()}
    batch = dist.host_local_batch_to_global(local, mesh)
    assert batch["video"].shape == (4, 4, 28, 28, 3)

    for _ in range(steps):
        state, metrics = train_step(state, batch, cfg, tc)
    print(f"RESULT {pid} {float(metrics['loss']):.6f} {int(state.step)}",
          flush=True)


if __name__ == "__main__":
    main()
