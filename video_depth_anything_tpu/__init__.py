"""video_depth_anything_tpu — TPU-native Video Depth Anything.

A from-scratch JAX/XLA/Pallas re-design of Video Depth Anything
(consistent relative/metric depth for arbitrarily long videos) built for
TPU hardware: bf16 MXU compute, static-shape jit graphs, mesh-sharded
sliding-window inference, and Pallas kernels for the attention hot paths.

Capability parity target: jkworldchampion/Video-Depth-Anything
(reference layout documented in SURVEY.md). This is not a port — the
compute path is functional JAX with NHWC layouts, scan-stacked
transformer blocks, and in-graph window stitching.
"""

__version__ = "0.1.0"

from .config import MODEL_CONFIGS, InferConfig, ModelConfig  # noqa: F401
