"""Worker for tests/test_distributed.py::test_two_process_inference
(not a pytest module).

Joins a 2-process CPU cluster (gloo) and runs mesh-sharded batch window
inference through the public VideoDepthPipeline API: windows chunked over
the global "data" axis, each host feeding only its rows
(pipeline/infer.py::_put_windows), outputs allgathered back to every host
(pipeline/infer.py::_fetch). The reference has no multi-device inference
at all; this is the TPU-native serving extension (SURVEY §2.7).

argv: <process_id> <num_processes> <port> <out.npy>
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
from video_depth_anything_tpu.pipeline import VideoDepthPipeline  # noqa: E402


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    dist.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    mesh = dist.global_mesh()
    assert mesh.shape["data"] == 2 * nproc

    cfg = ModelConfig(
        encoder="_tinydinf",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32, out_channels=(32, 32, 32, 32), num_frames=32,
        taps=(0, 0, 1, 1))
    params = init_params(0, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(70, 42, 56, 3), dtype=np.uint8)

    pipe = VideoDepthPipeline(cfg, params, mesh=mesh, use_pallas=False)
    depths, _ = pipe.infer_video_depth(frames, input_size=28, fp32=True,
                                       windows_per_batch=4)
    np.save(out, depths)
    print(f"RESULT {pid} {depths.shape} {float(np.abs(depths).sum()):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
